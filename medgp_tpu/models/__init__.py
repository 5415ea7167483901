from medgp_tpu.models.params import LMCSMSpec, SESpec, SMSpec, KernelSpec  # noqa: F401
