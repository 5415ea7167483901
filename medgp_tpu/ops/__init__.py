from medgp_tpu.ops.gram import (  # noqa: F401
    sm_base,
    squared_dist,
    gram_lmcsm,
    gram_se,
    gram_sm,
    cross_gram_lmcsm,
    diag_lmcsm,
)
from medgp_tpu.ops.nlml import (  # noqa: F401
    masked_nlml,
    jittered_cholesky,
    predict,
)
