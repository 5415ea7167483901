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
import os
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
    # generate is pure filesystem/config work; it must never attach to the
    # TPU (a wedged tunnel would hang it, and the container pins the axon
    # platform via jax.config so the JAX_PLATFORMS env alone cannot opt out)
    import jax

    jax.config.update("jax_platforms", "cpu")
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
        cfg, records, n_restarts=args.restarts, max_batch=args.max_batch,
        large_threshold=args.large_threshold, ckpt_dir=args.ckpt_dir,
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
    """Fused pipeline: train [-> sampler] -> kernclust (all folds) -> test
    -> eval.

    Unlike the reference's five file-joined batch stages
    (run_exp_generator.py:213-263), training results flow straight into
    clustering in memory; on a multi-device mesh the per-fold population
    noise modes are computed over ICI (one all_gather + in-program KDE for
    ALL folds) instead of a host re-derivation. With --sampler, posterior
    inference (HMC/NUTS/VI) runs after MAP and clustering consumes the
    posterior-MEAN hypers instead of the MAP point (BASELINE.json
    configs[2]'s "posterior -> clustering" path — the capability the
    reference lacks). Files are still written at every old stage boundary
    for inspection.
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
    if not trained_pans:
        raise RuntimeError(
            "no successfully trained patients — nothing to cluster "
            "(check train_flag_* / data quality: >=2 obs per feature)"
        )
    hyps = _np.stack([tout[p]["theta"] for p in trained_pans])

    if args.sampler != "none":
        from medgp_tpu.parallel.runner import hmc_cohort

        sout = hmc_cohort(
            cfg, [r for r in records if r.pan in set(trained_pans)],
            num_chains=args.chains, num_warmup=args.warmup,
            num_samples=args.samples, sampler=args.sampler,
        )
        # clustering consumes the posterior mean instead of the MAP point
        n_post = 0
        for i, p in enumerate(trained_pans):
            if p in sout and "post_mean" in sout[p]:
                hyps[i] = sout[p]["post_mean"]
                n_post += 1
        log.info(
            "[run] %s posterior means for %d/%d patients at %.1fs",
            args.sampler, n_post, len(trained_pans), time.time() - t0,
        )

    # in-program cross-patient collective: per-fold log noise modes over ICI
    fold_noise_modes = None
    import jax

    from medgp_tpu.models.params import LMCSMSpec

    spec = cfg.spec()
    if len(jax.devices()) > 1 and isinstance(spec, LMCSMSpec):
        import jax.numpy as jnp

        from medgp_tpu.parallel.mesh import (
            cohort_mesh,
            population_noise_modes_by_fold,
        )

        mesh = cohort_mesh()
        n_dev = mesh.devices.size
        cv_full = cfg.cv_assign()
        fold_of = {p: int(f) for p, f in zip(cfg.pans(), cv_full)}
        P = len(trained_pans)
        pad = (-P) % n_dev
        th = _np.concatenate(
            [hyps, _np.zeros((pad, hyps.shape[1]))]
        ).astype(_np.float32)
        fl = _np.concatenate([_np.ones(P), _np.zeros(pad)]).astype(
            _np.float32
        )
        cvs = _np.concatenate(
            [[fold_of[p] for p in trained_pans], _np.full(pad, -2)]
        ).astype(_np.int32)
        fold_noise_modes = _np.asarray(
            population_noise_modes_by_fold(spec, mesh, cfg.cv_fold_num)(
                jnp.asarray(th), jnp.asarray(fl), jnp.asarray(cvs)
            ),
            _np.float64,
        )
        log.info(
            "[run] ICI noise modes (%d folds + all): %s",
            cfg.cv_fold_num, _np.round(fold_noise_modes, 4),
        )

    from medgp_tpu.parallel.runner import stage_metrics

    metrics = stage_metrics(cfg)
    cv = cfg.cv_assign()
    for fold in range(-1, cfg.cv_fold_num):
        nm = (
            None if fold_noise_modes is None
            else fold_noise_modes[fold]  # row -1 == last row == fold -1
        )
        kernel_clustering_fold_in_memory(
            spec, cfg.exp_kernel_dir, trained_pans, hyps, cv, cfg.pans(),
            fold, algorithm=args.alg, seed=cfg.random_seed,
            noise_mode=nm, metrics=metrics,
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
            s.add_argument("--max-batch", type=int, default=128)
            s.add_argument(
                "--large-threshold", type=int, default=None,
                help="n_obs above which a patient trains via the "
                "row-sharded distributed objective (default: "
                "cfg.large_patient_threshold)",
            )
            s.add_argument(
                "--ckpt-dir", default=None,
                help="per-bucket checkpoint dir: a re-run resumes at the "
                "first unfinished bucket (utils/checkpoints.py)",
            )
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

    r = sub.add_parser(
        "run", help="fused train[+sampler]+kernclust+test+eval"
    )
    r.add_argument("--cfg", required=True)
    r.add_argument("--alg", default="gmm")
    r.add_argument("--restarts", type=int, default=None)
    r.add_argument(
        "--sampler", choices=("none", "hmc", "nuts", "vi"), default="none",
        help="run posterior inference after MAP and feed posterior-mean "
        "hypers into clustering instead of the MAP point",
    )
    r.add_argument("--chains", type=int, default=4)
    r.add_argument("--warmup", type=int, default=200)
    r.add_argument("--samples", type=int, default=200)
    r.set_defaults(func=cmd_run)
    return p


def _init_devices_with_watchdog(timeout: float = 60.0):
    """Attach to the backend with a diagnostic watchdog: device init on the
    TPU tunnel can hang for minutes after ANY earlier TPU process was killed
    (the wedge every stage inherited silently before — a preempted scheduler
    job or a Ctrl-C poisoned the next runs with zero indication). The
    watchdog cannot un-wedge the tunnel, but it names the condition and the
    remedy instead of hanging mutely."""
    import threading

    import jax

    done = threading.Event()

    def warn():
        waited = 0.0
        while not done.wait(timeout):
            waited += timeout
            log.warning(
                "jax device init still pending after %.0fs — a previously "
                "killed TPU-attached process can wedge the tunnel for "
                "minutes; waiting it out (do NOT kill this process: that "
                "would wedge the NEXT run too)", waited,
            )

    threading.Thread(target=warn, daemon=True).start()
    t0 = time.time()
    devs = jax.devices()
    done.set()
    log.info(
        "%d device(s) [%s] attached in %.1fs",
        len(devs), devs[0].platform, time.time() - t0,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.command != "generate":  # generate never touches jax
        from medgp_tpu.utils.compile_cache import (
            enable_compile_cache,
            ensure_stable_hash_seed,
        )

        if argv is None:  # real CLI invocation, not an in-process call
            ensure_stable_hash_seed()
        # MEDGP_PLATFORM overrides the backend (e.g. cpu + 8 virtual
        # devices for a mesh run without TPU hardware). Needed because the
        # container may pin a platform via jax.config at interpreter start,
        # where the JAX_PLATFORMS env var cannot override it.
        platform = os.environ.get("MEDGP_PLATFORM")
        if platform:
            import jax

            jax.config.update("jax_platforms", platform)
        enable_compile_cache()
        _init_devices_with_watchdog()
    args.func(args)


if __name__ == "__main__":
    main()
