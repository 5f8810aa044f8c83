"""Variable-length sequence regression with the Conv1dRBF kernel.

    python examples/sequence_regression.py
"""


import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset


def main():
    rng = np.random.default_rng(0)
    n, max_len, d = 2000, 24, 12
    x = rng.standard_normal((n, max_len, d))
    lengths = rng.integers(9, max_len + 1, size=(n,)).astype(np.int32)
    w = rng.standard_normal(d) / np.sqrt(d)
    y = np.zeros(n)
    for i in range(n):
        x[i, lengths[i]:] = 0.0
        y[i] = np.sin(x[i, :lengths[i]] @ w).mean()
    y += 0.05 * rng.standard_normal(n)

    tr = slice(0, 1600)
    te = slice(1600, None)
    data = build_regression_dataset(x[tr], y[tr],
                                    sequence_lengths=lengths[tr],
                                    chunk_size=400)

    model = GPRegression(num_rffs=1024, kernel_choice="Conv1dRBF",
                         kernel_settings={"conv_width": 9},
                         verbose=False)
    model.tune_hyperparams_crude(data, max_bayes_iter=15)
    model.fit(data, mode="cg", suppress_var=True)
    preds = model.predict(x[te], sequence_lengths=lengths[te])
    from scipy.stats import spearmanr
    rho = spearmanr(preds, y[te])[0]
    print(f"held-out Spearman rho: {rho:.3f}")


if __name__ == "__main__":
    main()
