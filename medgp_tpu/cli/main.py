"""Command-line interface: the reference's 4-stage UX, fused or staged.

    python -m medgp_tpu.cli.main generate  ...   # build experiment dir
    python -m medgp_tpu.cli.main train     --cfg .../exp_setup.json
    python -m medgp_tpu.cli.main kernclust --cfg ... --fold -1 --alg gmm
    python -m medgp_tpu.cli.main test      --cfg ... --alg gmm
    python -m medgp_tpu.cli.main eval      --cfg ... --test-mode mean_w_update
    python -m medgp_tpu.cli.main run       --cfg ...  # all stages, in-process

Each staged command reads/writes the reference-format artifacts so any stage
can be swapped against the C++/Python reference pipeline. `run` collapses the
5-script filesystem dataflow into one program (stage handoff in memory,
artifacts still written for inspection).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("medgp_tpu")


def _load_cfg(path):
    import os

    from medgp_tpu.config.experiment import ExperimentConfig

    if not os.path.exists(path):
        raise SystemExit(
            f"medgp-tpu: config file not found: {path} "
            "(expected the exp_setup.json written by `generate`)"
        )
    return ExperimentConfig.from_json(path)


def _load_records(cfg, pans=None):
    from medgp_tpu.data.cohort import load_cohort
    from medgp_tpu.runtime import bindings

    pans = pans if pans is not None else cfg.pans()
    if bindings.native_available():
        return bindings.load_cohort_native(
            cfg.data_dir, pans, cfg.feature_list
        )
    return load_cohort(cfg.data_dir, pans, cfg.feature_list)


def cmd_generate(args):
    from medgp_tpu.config.experiment import generate_experiment

    feature_list = json.load(open(args.feature_config))["feature_list"]
    fidx = [f["index"] for f in feature_list]
    opt = json.load(open(args.opt_config)) if args.opt_config else {}
    cfg = generate_experiment(
        data_root=args.data_root,
        exp_root=args.exp_root,
        cohort=args.cohort,
        feature_list=fidx,
        kernel=args.kernel,
        prior=args.prior,
        Q=args.Q, R=args.R, eta=args.eta, beta_lam=args.beta_lam,
        cv_fold_num=args.cv_fold_num,
        cv_seed=args.cv_seed,
        exp_prefix=args.exp_prefix,
        opt_config=opt,
    )
    print(cfg.exp_top_dir)


def cmd_train(args):
    cfg = _load_cfg(args.cfg)
    pans = [args.pan] if args.pan else None
    records = _load_records(cfg, pans)
    from medgp_tpu.parallel.runner import train_cohort

    t0 = time.time()
    out = train_cohort(
        cfg, records, n_restarts=args.restarts, max_batch=args.max_batch
    )
    ok = sum(1 for r in out.values() if r["flag"])
    log.info(
        "trained %d/%d patients in %.1fs", ok, len(out), time.time() - t0
    )


def cmd_kernclust(args):
    cfg = _load_cfg(args.cfg)
    from medgp_tpu.cluster.pipeline import kernel_clustering_fold

    folds = (
        [args.fold]
        if args.fold is not None
        else list(range(-1, cfg.cv_fold_num))
    )
    from medgp_tpu.parallel.runner import stage_metrics

    metrics = stage_metrics(cfg)
    cv = cfg.cv_assign()
    for fold in folds:
        mode_theta, newQ = kernel_clustering_fold(
            cfg.spec(), cfg.exp_train_dir, cfg.exp_kernel_dir,
            cfg.pans(), cv, fold, algorithm=args.alg, seed=cfg.random_seed,
            metrics=metrics,
        )
        log.info("fold %d: %d mode mixture components", fold, newQ)


def cmd_test(args):
    cfg = _load_cfg(args.cfg)
    pans = cfg.pans()
    records = _load_records(cfg, [args.pan] if args.pan else None)
    from medgp_tpu.parallel.runner import test_cohort

    if args.fold is not None:
        folds = np.full(len(records), args.fold)
    else:
        cv = cfg.cv_assign()
        index = {p: i for i, p in enumerate(pans)}
        folds = np.asarray([cv[index[r.pan]] for r in records])
    t0 = time.time()
    test_cohort(cfg, records, folds=folds, kernclust_alg=args.alg)
    log.info("tested %d patients in %.1fs", len(records), time.time() - t0)


def cmd_eval(args):
    cfg = _load_cfg(args.cfg)
    from medgp_tpu.evaluation.evals import eval_cohort, summarize
    from medgp_tpu.parallel.runner import stage_metrics

    res = eval_cohort(
        cfg.data_dir, cfg.exp_test_dir, args.test_mode,
        cfg.feature_list, cfg.pans(), metrics=stage_metrics(cfg),
    )
    s = summarize(res)
    log.info(
        "%s: cohort MAE=%.4f CI-coverage=%.2f%%",
        args.test_mode, s["mae"], s["ci_ratio"],
    )
    print(json.dumps(s))


def cmd_hmc(args):
    cfg = _load_cfg(args.cfg)
    records = _load_records(cfg, [args.pan] if args.pan else None)
    from medgp_tpu.parallel.runner import hmc_cohort

    t0 = time.time()
    out = hmc_cohort(
        cfg, records,
        num_chains=args.chains, num_warmup=args.warmup,
        num_samples=args.samples, num_leapfrog=args.leapfrog,
        init_step_size=args.step_size,
        sampler=args.sampler, max_depth=args.max_depth,
    )
    log.info(
        "sampled %d/%d patients in %.1fs",
        len(out), len(records), time.time() - t0,
    )


def cmd_run(args):
    """Fused pipeline: train -> kernclust (all folds) -> test -> eval.

    Unlike the reference's five file-joined batch stages
    (run_exp_generator.py:213-263), training results flow straight into
    clustering in memory; on a multi-device mesh the population noise mode
    is computed over ICI (all_gather + KDE) instead of a host re-derivation.
    Files are still written at every old stage boundary for inspection.
    """
    cfg = _load_cfg(args.cfg)
    import numpy as _np

    from medgp_tpu.cluster.pipeline import kernel_clustering_fold_in_memory
    from medgp_tpu.evaluation.evals import eval_cohort, summarize
    from medgp_tpu.parallel.runner import test_cohort, train_cohort

    t0 = time.time()
    records = _load_records(cfg)
    tout = train_cohort(cfg, records, n_restarts=args.restarts)
    log.info("[run] train done at %.1fs", time.time() - t0)

    trained_pans = [p for p, r in tout.items() if r["flag"]]
    hyps = _np.stack([tout[p]["theta"] for p in trained_pans])

    # in-program cross-patient collective: log noise modes over ICI
    noise_mode = None
    import jax

    from medgp_tpu.models.params import LMCSMSpec

    spec = cfg.spec()
    if len(jax.devices()) > 1 and isinstance(spec, LMCSMSpec):
        import jax.numpy as jnp

        from medgp_tpu.parallel.mesh import cohort_mesh, population_noise_mode

        mesh = cohort_mesh()
        n_dev = mesh.devices.size
        P = len(trained_pans)
        pad = (-P) % n_dev
        th = _np.concatenate(
            [hyps, _np.zeros((pad, hyps.shape[1]))]
        ).astype(_np.float32)
        fl = _np.concatenate([_np.ones(P), _np.zeros(pad)]).astype(
            _np.float32
        )
        noise_mode = _np.asarray(
            population_noise_mode(spec, mesh)(
                jnp.asarray(th), jnp.asarray(fl)
            ),
            _np.float64,
        )
        log.info("[run] ICI noise mode: %s", _np.round(noise_mode, 4))

    from medgp_tpu.parallel.runner import stage_metrics

    metrics = stage_metrics(cfg)
    cv = cfg.cv_assign()
    for fold in range(-1, cfg.cv_fold_num):
        kernel_clustering_fold_in_memory(
            spec, cfg.exp_kernel_dir, trained_pans, hyps, cv, cfg.pans(),
            fold, algorithm=args.alg, seed=cfg.random_seed,
            noise_mode=noise_mode, metrics=metrics,
        )
    log.info("[run] kernclust done at %.1fs", time.time() - t0)

    pans = cfg.pans()
    index = {p: i for i, p in enumerate(pans)}
    folds = np.asarray([cv[index[r.pan]] for r in records])
    test_cohort(cfg, records, folds=folds, kernclust_alg=args.alg)
    log.info("[run] test done at %.1fs", time.time() - t0)

    summary = {}
    for mode in ("mean_wo_update", "mean_w_update"):
        res = eval_cohort(
            cfg.data_dir, cfg.exp_test_dir, mode, cfg.feature_list, pans,
            metrics=metrics,
        )
        summary[mode] = summarize(res)
    log.info("[run] done in %.1fs: %s", time.time() - t0, summary)
    print(json.dumps(summary))


def build_parser():
    p = argparse.ArgumentParser(prog="medgp-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate", help="create an experiment directory")
    g.add_argument("--data-root", required=True)
    g.add_argument("--exp-root", required=True)
    g.add_argument("--cohort", required=True)
    g.add_argument("--feature-config", required=True)
    g.add_argument("--opt-config", default=None)
    g.add_argument("--kernel", default="LMC-SM")
    g.add_argument("--prior", default="hier-gamma")
    g.add_argument("--Q", type=int, default=5)
    g.add_argument("--R", type=int, default=8)
    g.add_argument("--eta", type=float, default=0.01)
    g.add_argument("--beta-lam", type=float, default=0.01)
    g.add_argument("--cv-fold-num", type=int, default=10)
    g.add_argument("--cv-seed", type=int, default=718)
    g.add_argument("--exp-prefix", default="exp_0000")
    g.set_defaults(func=cmd_generate)

    for name, fn in [("train", cmd_train), ("test", cmd_test)]:
        s = sub.add_parser(name)
        s.add_argument("--cfg", required=True)
        s.add_argument("--pan", default=None, help="single patient id")
        if name == "train":
            s.add_argument("--restarts", type=int, default=None)
            s.add_argument("--max-batch", type=int, default=64)
        else:
            s.add_argument("--fold", type=int, default=None)
            s.add_argument("--alg", default="gmm")
        s.set_defaults(func=fn)

    k = sub.add_parser("kernclust")
    k.add_argument("--cfg", required=True)
    k.add_argument("--fold", type=int, default=None, help="default: all folds")
    k.add_argument("--alg", default="gmm")
    k.set_defaults(func=cmd_kernclust)

    e = sub.add_parser("eval")
    e.add_argument("--cfg", required=True)
    e.add_argument("--test-mode", required=True)
    e.set_defaults(func=cmd_eval)

    h = sub.add_parser(
        "hmc", help="posterior sampling over trained hypers (post-MAP)"
    )
    h.add_argument("--cfg", required=True)
    h.add_argument("--pan", default=None)
    h.add_argument("--chains", type=int, default=4)
    h.add_argument("--warmup", type=int, default=300)
    h.add_argument("--samples", type=int, default=300)
    h.add_argument("--leapfrog", type=int, default=16)
    h.add_argument(
        "--sampler", choices=("hmc", "nuts", "vi"), default="hmc",
        help="hmc = jittered fixed trajectories; vi = mean-field ADVI "
        "(--warmup steps of ELBO ascent, --samples draws); nuts = adaptive "
             "trajectory lengths (fixed-shape iterative tree)",
    )
    h.add_argument(
        "--max-depth", type=int, default=6,
        help="NUTS tree depth bound (<= 2^depth - 1 gradient evals/draw)",
    )
    h.add_argument("--step-size", type=float, default=0.005)
    h.set_defaults(func=cmd_hmc)

    r = sub.add_parser("run", help="fused train+kernclust+test+eval")
    r.add_argument("--cfg", required=True)
    r.add_argument("--alg", default="gmm")
    r.add_argument("--restarts", type=int, default=None)
    r.set_defaults(func=cmd_run)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
