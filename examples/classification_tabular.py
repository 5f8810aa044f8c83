"""End-to-end tabular classification: fit -> predict class probabilities.

Mirrors the reference's classification workflow (xGPClassification,
src/xGPR/xgp_classification.py): multinomial-logistic fit on random
features via preconditioned nonlinear CG.

    python examples/classification_tabular.py
"""


import numpy as np
from xgpr_tpu import GPClassification, build_classification_dataset


def main():
    rng = np.random.default_rng(0)
    n, d, n_classes = 4000, 16, 3
    x = rng.standard_normal((n, d))
    centers = rng.standard_normal((n_classes, d)) * 1.5
    logits = x @ centers.T + 0.5 * np.sin(x[:, :1])
    y = np.argmax(logits + 0.3 * rng.standard_normal((n, n_classes)),
                  axis=1).astype(np.int64)
    x_train, x_test = x[:3000], x[3000:]
    y_train, y_test = y[:3000], y[3000:]

    data = build_classification_dataset(x_train, y_train, chunk_size=1000)

    model = GPClassification(num_rffs=1024, kernel_choice="RBF",
                             verbose=False)
    # lambda (noise) and sigma (inverse lengthscale), log-space.
    model.set_hyperparams(np.log(np.array([0.1, 0.2])), dataset=data)
    model.fit(data)

    probs = model.predict(x_test)
    acc = float(np.mean(np.argmax(probs, axis=1) == y_test))
    print(f"test accuracy: {acc:.2%} over {n_classes} classes")
    print(f"mean max-class probability: {probs.max(axis=1).mean():.3f}")


if __name__ == "__main__":
    main()


