"""End-to-end pipeline over every main kernel family: crude-tune at small
num_rffs -> CG fit at larger num_rffs -> exact fit -> held-out Spearman
floors (reference: tests/complete_pipeline_tests/test_current_kernels.py
with per-kernel floors in current_kernel_list.py:15-22)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data, sequence_data, spearman

# (kernel, settings, tabular?, spearman floor) -- floors calibrated on the
# synthetic fixtures, playing the role of the reference's per-kernel floors.
TABULAR_KERNELS = [
    ("RBF", {}, 0.60),
    ("Matern", {"matern_nu": 5 / 2}, 0.58),
    ("Cauchy", {}, 0.55),
    ("Linear", {}, 0.25),
    ("MiniARD", {"split_points": [40]}, 0.50),
]
SEQUENCE_KERNELS = [
    ("Conv1dRBF", {"conv_width": 9}, 0.45),
    ("GraphRBF", {}, 0.35),
]


@pytest.fixture(scope="module")
def tabular():
    (trx, tr_y), (tex, te_y) = tabular_data()
    dset = build_regression_dataset(trx, tr_y, chunk_size=400)
    return dset, tex, te_y


@pytest.fixture(scope="module")
def sequences():
    (trx, tr_y, trl), (tex, te_y, tel) = sequence_data()
    dset = build_regression_dataset(trx, tr_y, sequence_lengths=trl,
                                    chunk_size=200)
    return dset, tex, te_y, tel


@pytest.mark.parametrize("kernel,settings,floor", TABULAR_KERNELS)
def test_tabular_pipeline(tabular, kernel, settings, floor):
    dset, tex, te_y = tabular
    model = GPRegression(num_rffs=512, kernel_choice=kernel,
                         kernel_settings=settings, verbose=False)
    if kernel == "Linear":
        # Single-hparam kernel: crude tuner uses the 1-d search.
        model.tune_hyperparams_crude(dset)
    else:
        model.tune_hyperparams_crude(dset, max_bayes_iter=15)
    hparams = model.get_hyperparams()

    fit_model = GPRegression(num_rffs=2048, kernel_choice=kernel,
                             kernel_settings=settings, verbose=False)
    fit_model.set_hyperparams(hparams, dset)
    fit_model.fit(dset, mode="cg", tol=1e-6, suppress_var=True)
    assert spearman(fit_model.predict(tex), te_y) > floor

    exact_model = GPRegression(num_rffs=1024, kernel_choice=kernel,
                               kernel_settings=settings, verbose=False)
    exact_model.set_hyperparams(hparams, dset)
    exact_model.fit(dset, mode="exact", suppress_var=True)
    assert spearman(exact_model.predict(tex), te_y) > floor - 0.03


@pytest.mark.parametrize("kernel,settings,floor", SEQUENCE_KERNELS)
def test_sequence_pipeline(sequences, kernel, settings, floor):
    dset, tex, te_y, tel = sequences
    model = GPRegression(num_rffs=512, kernel_choice=kernel,
                         kernel_settings=settings, verbose=False)
    model.tune_hyperparams_crude(dset, max_bayes_iter=10)
    hparams = model.get_hyperparams()

    fit_model = GPRegression(num_rffs=1024, kernel_choice=kernel,
                             kernel_settings=settings, verbose=False)
    fit_model.set_hyperparams(hparams, dset)
    fit_model.fit(dset, mode="cg", tol=1e-6, suppress_var=True)
    assert spearman(fit_model.predict(tex, sequence_lengths=tel),
                    te_y) > floor


def test_two_layer_conv_pipeline(sequences):
    dset, tex, te_y, tel = sequences
    model = GPRegression(num_rffs=512, kernel_choice="Conv1dTwoLayer",
                         kernel_settings={"conv_width": 9,
                                          "init_rffs": 256},
                         verbose=False)
    model.tune_hyperparams_crude(dset, max_bayes_iter=10)
    model.fit(dset, mode="exact", suppress_var=True)
    rho = spearman(model.predict(tex, sequence_lengths=tel), te_y)
    assert rho > 0.3


@pytest.mark.parametrize("kernel,settings", [
    ("Conv1dMatern", {"conv_width": 5, "matern_nu": 3 / 2}),
    ("Conv1dCauchy", {"conv_width": 5}),
    ("GraphMatern", {"matern_nu": 5 / 2}),
    ("GraphCauchy", {}),
])
def test_conv_chi_variant_kernels(sequences, kernel, settings):
    """Matern/Cauchy conv and graph variants: the chi modification must
    change the features vs the RBF baseline, and an exact fit must
    produce finite, non-trivial held-out predictions."""
    dset, tex, te_y, tel = sequences
    import numpy as np
    model = GPRegression(num_rffs=512, kernel_choice=kernel,
                         kernel_settings=settings, verbose=False)
    model.tune_hyperparams_crude(dset, max_bayes_iter=10)
    base_name = "GraphRBF" if kernel.startswith("Graph") else "Conv1dRBF"
    base_settings = {k: v for k, v in settings.items()
                     if k != "matern_nu"}
    base = GPRegression(num_rffs=512, kernel_choice=base_name,
                        kernel_settings=base_settings, verbose=False)
    base.set_hyperparams(np.log(np.array([0.1, 1.0])), dset)
    za = model.kernel.transform_x(tex[:8], tel[:8])
    zb = base.kernel.transform_x(tex[:8], tel[:8])
    assert not np.allclose(np.asarray(za), np.asarray(zb))

    model.fit(dset, mode="exact", suppress_var=True)
    preds = model.predict(tex, sequence_lengths=tel)
    assert np.all(np.isfinite(preds))
    from scipy.stats import spearmanr
    rho = spearmanr(preds, te_y)[0]
    assert rho > 0.2
