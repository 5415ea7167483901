/* nlml_probe: evaluate the REFERENCE implementation's objective (NLML,
 * optionally + prior) and gradient at a FIXED hyperparameter vector.
 *
 * This is medgp_tpu tooling (not reference code): it links the reference
 * object files compiled by build.sh and drives their public API the same
 * way main_one_train.cpp:204-260 does, so the probed numbers are the
 * actually-executed C++ values — the ground truth for executable-level
 * parity tests against ops/nlml.py and models/gp.py.
 *
 * usage:
 *   nlml_probe --cfg exp_setup.json --pan PAN --theta theta.txt \
 *              [--inference exact|prior] [--grad 0|1]
 *
 * theta.txt: one double per line, reference flat hyper layout
 * (lik || cov || mean — c_hyperparam.cpp pack order).
 * output: "objective <%.17g>" then (with --grad 1) "grad <i> <%.17g>".
 */
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "dataio/c_experiment.h"
#include "util/c_objective.h"
#include "util/c_objective_one.h"
#include "core/gp_model_include.h"

using namespace std;

int main(int argc, const char *argv[]) {
  string cfg, pan, theta_file, inference = "exact";
  int want_grad = 1;
  for (int i = 1; i + 1 < argc; i += 2) {
    if (!strcmp(argv[i], "--cfg")) cfg = argv[i + 1];
    else if (!strcmp(argv[i], "--pan")) pan = argv[i + 1];
    else if (!strcmp(argv[i], "--theta")) theta_file = argv[i + 1];
    else if (!strcmp(argv[i], "--inference")) inference = argv[i + 1];
    else if (!strcmp(argv[i], "--grad")) want_grad = atoi(argv[i + 1]);
    else { fprintf(stderr, "unknown arg %s\n", argv[i]); return 2; }
  }
  if (cfg.empty() || pan.empty() || theta_file.empty()) {
    fprintf(stderr, "need --cfg --pan --theta\n");
    return 2;
  }

  c_experiment exp(cfg);
  const int kidx = exp.get_kernel_index();
  if (kidx != 7 && kidx != 0 && kidx != 8) {
    fprintf(stderr, "probe supports kernel_index 0 (SE), 8 (SM), 7\n");
    return 2;
  }

  vector<int> meta;
  vector<float> t, y;
  exp.get_one_patient_data(pan, meta, t, y);
  fprintf(stderr, "n_obs=%zu\n", t.size());

  vector<double> theta;
  {
    ifstream f(theta_file.c_str());
    double v;
    while (f >> v) theta.push_back(v);
  }
  fprintf(stderr, "n_hyp=%zu\n", theta.size());

  /* model wiring per family, exactly as main_one_train.cpp:103-150 */
  c_kernel_LMC_SM kernel_lmc(exp.get_kernel_param());
  c_kernel_SE kernel_se(exp.get_kernel_param());
  c_kernel_SM kernel_sm(exp.get_kernel_param());
  c_meanfunc_zero meanfunc;
  c_likelihood_gaussianMO likfunc_mo(exp.get_lik_param());
  c_likelihood_gaussian likfunc_g;
  c_prior prior(exp.get_cov_num(), exp.get_mean_num(), exp.get_lik_num());
  c_inference_exact inf_exact(1);
  c_inference_prior inf_prior(1);

  c_kernel *kptr;
  c_likelihood *lptr;
  if (kidx == 7) {
    kptr = &kernel_lmc;
    lptr = &likfunc_mo;
  } else if (kidx == 8) {
    kptr = &kernel_sm;
    lptr = &likfunc_g;
  } else {
    kptr = &kernel_se;
    lptr = &likfunc_g;
  }
  c_meanfunc *mptr = &meanfunc;
  c_prior *pptr = &prior;
  c_inference *iptr;
  if (inference == "prior") {
    prior.initialize_param(exp.get_cov_num(), exp.get_mean_num(),
                           exp.get_lik_num());
    prior.setup_param(exp.get_kernel_index(), exp.get_kernel_param(),
                      exp.get_prior_mode(), exp.get_prior_hyp());
    iptr = &inf_prior;
  } else {
    iptr = &inf_exact;
  }

  c_objective_one obj(exp.get_kernel_index(), exp.get_kernel_param(), meta,
                      t, y);
  double value = 0.0;
  vector<double> grads;
  bool ok = obj.compute_objective(want_grad != 0, theta, value, grads, kptr,
                                  mptr, lptr, iptr, pptr);
  if (!ok) {
    printf("objective FAILED\n");
    return 1;
  }
  printf("objective %.17g\n", value);
  if (want_grad) {
    for (size_t i = 0; i < grads.size(); ++i)
      printf("grad %zu %.17g\n", i, grads[i]);
  }
  return 0;
}
