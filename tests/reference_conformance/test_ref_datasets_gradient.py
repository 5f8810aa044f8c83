"""Conformance: dataset statistics and NMLL-gradient gates on the
reference's shipped data.

* Online and offline datasets built from the same shipped blocks must
  agree on y-mean / y-std / xdim (reference basic_dataset_tests/
  test_dataset_initialization.py:17-37).
* The analytic exact-NMLL gradient must match a numerical
  scipy.optimize.approx_fprime gradient to < 0.5% relative error at the
  golden hyperparams (reference gradient_calc_tests/
  kernel_specific_gradient_test.py:21-66).
"""
import sys
import os

import numpy as np
from scipy.optimize import approx_fprime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from utils.reference_data import (requires_reference_data,
                                  reference_dataset, CG_FIT_HPARAM)

pytestmark = requires_reference_data


def test_online_offline_stats_agree():
    online = reference_dataset(conv=False, offline=False)
    offline = reference_dataset(conv=False, offline=True)
    assert np.isclose(online.get_ymean(), offline.get_ymean())
    assert np.isclose(online.get_ystd(), offline.get_ystd())
    assert tuple(online.get_xdim()) == tuple(offline.get_xdim())

    online_c = reference_dataset(conv=True, offline=False)
    offline_c = reference_dataset(conv=True, offline=True)
    assert np.isclose(online_c.get_ymean(), offline_c.get_ymean())
    assert np.isclose(online_c.get_ystd(), offline_c.get_ystd())
    assert tuple(online_c.get_xdim()) == tuple(offline_c.get_xdim())


def test_exact_nmll_gradient_on_reference_data():
    dset = reference_dataset(conv=False)
    model = GPRegression(num_rffs=512, variance_rffs=12,
                         kernel_choice="RBF", verbose=False,
                         random_seed=123,
                         kernel_settings={"intercept": True})
    model.set_hyperparams(CG_FIT_HPARAM, dset)

    def cost(h):
        return model.exact_nmll(h, dset)

    _, analytic = model.exact_nmll_gradient(CG_FIT_HPARAM, dset)
    numeric = approx_fprime(CG_FIT_HPARAM, cost, 1e-6)
    rel_err = np.linalg.norm(analytic - numeric) / np.linalg.norm(numeric)
    assert rel_err < 0.005
