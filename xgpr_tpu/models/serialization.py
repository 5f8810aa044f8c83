"""Model checkpointing.

The reference has no save/load; users pickle the model object
(SURVEY.md section 5: state is (hyperparams, seed, weights, var) and all
projection state regenerates from the seed).  Here that contract is made
explicit: ``save_model`` writes a single .npz with the model's defining
state, ``load_model`` reconstructs the model and regenerates radem/chi
deterministically from the stored seed.
"""
import json

import numpy as np


def save_model(model, path):
    """Serialize a fitted (or unfitted) model to an .npz file."""
    meta = {
        "class": type(model).__name__,
        "kernel_choice": model.kernel_choice,
        "num_rffs": int(model.num_rffs),
        "variance_rffs": int(model.variance_rffs),
        "kernel_settings": model.kernel_spec_parms,
        "random_seed": int(model.random_seed),
        "verbose": bool(model.verbose),
        "trainy_mean": float(model.trainy_mean),
        "trainy_std": float(model.trainy_std),
        "exact_var_calculation": bool(model.exact_var_calculation),
        "n_classes": int(model.n_classes),
        "xdim": list(model.kernel.get_xdim()) if model.kernel is not None
                else None,
    }
    arrays = {"_meta": np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)}
    if model.kernel is not None:
        arrays["hyperparams"] = model.kernel.get_hyperparams()
    if model.weights is not None:
        arrays["weights"] = np.asarray(model.weights)
    if model.var is not None and model.exact_var_calculation:
        arrays["var"] = np.asarray(model.var)
    if model.gamma is not None:
        arrays["gamma"] = np.asarray(model.gamma)
    np.savez(path, **arrays)


def load_model(path):
    """Reconstruct a model saved with save_model."""
    from .regression import GPRegression
    from .classification import GPClassification

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data["_meta"].tobytes()).decode())
        arrays = {k: data[k] for k in data.files if k != "_meta"}

    cls = {"GPRegression": GPRegression,
           "GPClassification": GPClassification}[meta["class"]]
    if meta["class"] == "GPRegression":
        model = cls(num_rffs=meta["num_rffs"],
                    variance_rffs=meta["variance_rffs"],
                    kernel_choice=meta["kernel_choice"],
                    kernel_settings=meta["kernel_settings"],
                    verbose=meta["verbose"],
                    random_seed=meta["random_seed"])
    else:
        model = cls(num_rffs=meta["num_rffs"],
                    kernel_choice=meta["kernel_choice"],
                    kernel_settings=meta["kernel_settings"],
                    verbose=meta["verbose"],
                    random_seed=meta["random_seed"])

    model.trainy_mean = meta["trainy_mean"]
    model.trainy_std = meta["trainy_std"]
    model.n_classes = meta["n_classes"]
    if meta["xdim"] is not None and "hyperparams" in arrays:
        model.set_hyperparams(arrays["hyperparams"],
                              xdim=tuple(meta["xdim"]))
    if "weights" in arrays:
        model.weights = arrays["weights"]
    if "var" in arrays:
        model.var = arrays["var"]
        model.exact_var_calculation = True
    if "gamma" in arrays:
        model.gamma = arrays["gamma"]
    return model
