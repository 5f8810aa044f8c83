"""Linear-kernel variance path (preconditioner-based, xgp_regression.py:
471-474) and tune_hyperparams with approximate NMLL."""
import sys
import os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data, spearman


def test_linear_kernel_variance_path():
    (trx, tr_y), (tex, te_y) = tabular_data(n_train=900)
    dset = build_regression_dataset(trx, tr_y, chunk_size=300)
    model = GPRegression(num_rffs=64, variance_rffs=32,
                         kernel_choice="Linear", verbose=False)
    model.set_hyperparams(np.log(np.array([0.5])), dset)
    model.fit(dset, mode="exact")
    assert not model.exact_var_calculation
    preds, var = model.predict(tex, get_var=True)
    assert spearman(preds, te_y) > 0.5
    assert np.all(var >= 0)


def test_tune_hyperparams_approximate_nmll():
    (trx, tr_y), _ = tabular_data(n_train=900)
    dset = build_regression_dataset(trx, tr_y, chunk_size=300)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    hparams, n_feval, score = model.tune_hyperparams(
        dset, tuning_method="Powell", max_iter=12,
        nmll_method="approximate", manual_settings={"max_rank": 128},
        starting_hyperparams=np.array([-1.0, -3.0]))
    assert np.isfinite(score)
    # The SLQ-scored tune must land close to the exact score at the
    # returned hyperparameters.
    exact = model.exact_nmll(hparams, dset)
    assert abs(score - exact) / abs(exact) < 0.02
