"""Standalone random-feature generation for kernel k-means / kPCA pipelines.

Parity: /root/reference/src/xGPR/kernel_fgen.py and auxiliary_baseclass.py
(intercept always forced off for auxiliary tools, :67).
"""
import numpy as np

from ..kernels import KERNEL_NAME_TO_CLASS, ARR_3D_KERNELS
from .. import constants


class AuxiliaryBaseclass:
    """Kernel construction shared by non-model tools."""

    def __init__(self, num_rffs, hyperparams, num_features,
                 kernel_choice="RBF", device=None, kernel_settings=None,
                 random_seed=123, verbose=True,
                 double_precision_fht=False):
        if kernel_settings is None:
            kernel_settings = dict(constants.DEFAULT_KERNEL_SPEC_PARMS)
        kernel_settings = dict(kernel_settings)
        kernel_settings["intercept"] = False
        self.verbose = verbose

        if kernel_choice not in KERNEL_NAME_TO_CLASS:
            raise RuntimeError("kernel_choice does not name a registered kernel.")

        if kernel_choice in ARR_3D_KERNELS:
            width = kernel_settings.get("conv_width", 10)
            xdim = (1, max(width, 10), num_features)
        else:
            xdim = (1, num_features)

        self.kernel = KERNEL_NAME_TO_CLASS[kernel_choice](
            xdim, num_rffs, random_seed, device, double_precision_fht,
            kernel_spec_parms=kernel_settings)
        self.double_precision_fht = double_precision_fht

        full_hparams = self.kernel.get_hyperparams()
        if full_hparams.shape[0] > 1:
            full_hparams[1:] = hyperparams
        self.kernel.set_hyperparams(full_hparams)

    def pre_prediction_checks(self, input_x, sequence_lengths):
        if not self.kernel.validate_new_datapoints(input_x):
            raise RuntimeError("Input array shape does not match the shape this kernel was built for.")
        if sequence_lengths is None:
            if input_x.ndim != 2:
                raise RuntimeError("sequence_lengths is required if using "
                                   "a convolution kernel.")
        elif input_x.ndim == 2:
            raise RuntimeError("Fixed-vector kernels take no "
                               "sequence_lengths argument; pass None.")


class KernelFGen(AuxiliaryBaseclass):
    """Generate random features for external pipelines
    (kernel_fgen.py:55-90)."""

    def predict(self, input_x, sequence_lengths=None, chunk_size=2000):
        self.pre_prediction_checks(input_x, sequence_lengths)
        preds = []
        for i in range(0, input_x.shape[0], chunk_size):
            cut = min(i + chunk_size, input_x.shape[0])
            slen = None if sequence_lengths is None else \
                sequence_lengths[i:cut]
            preds.append(np.asarray(
                self.kernel.transform_x(input_x[i:cut, ...], slen)))
        return np.vstack(preds)
