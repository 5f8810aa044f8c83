"""End-to-end tabular regression: tune -> fit -> predict with uncertainty.

    python examples/regression_tabular.py
"""


import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset


def main():
    rng = np.random.default_rng(0)
    # 8-d input: low enough dimensionality that 4k points genuinely pin
    # down an isotropic RBF surface (in very high dimensions the honest
    # GP answer for a ridge function is "mostly noise").
    n, d = 5000, 8
    x = rng.standard_normal((n, d))
    w = rng.standard_normal(d) / np.sqrt(d)
    y = np.sin(2 * x @ w) + 0.1 * rng.standard_normal(n)
    x_train, x_test = x[:4000], x[4000:]
    y_train, y_test = y[:4000], y[4000:]

    data = build_regression_dataset(x_train, y_train, chunk_size=1000)

    model = GPRegression(num_rffs=2048, variance_rffs=256,
                         kernel_choice="RBF", verbose=False)
    hparams, _, nmll = model.tune_hyperparams_crude(data)
    print(f"tuned hyperparams (log-space): {hparams}, NMLL: {nmll:.1f}")

    model.fit(data, mode="cg")
    preds, var = model.predict(x_test, get_var=True)
    rmse = float(np.sqrt(np.mean((preds - y_test) ** 2)))
    inside = np.mean(np.abs(preds - y_test) <= 2 * np.sqrt(var))
    print(f"test RMSE: {rmse:.4f} (noise 0.1); "
          f"2-sigma coverage: {inside:.2%}")


if __name__ == "__main__":
    main()
