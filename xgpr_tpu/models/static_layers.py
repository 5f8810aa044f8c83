"""Static feature-extraction layers.

Parity: /root/reference/src/xGPR/static_layers/fast_conv.py -- a one-shot
ReLU + global-maxpool conv random-feature extractor whose output feeds an
RBF model (3-layer-CNN analogue).
"""
import numpy as np

from ..kernels.l2_conv1d import FHTMaxpoolConv1dFeatureExtractor


class FastConv1d:
    """Convolution-based feature extraction for sequences / time series."""

    def __init__(self, seq_width, device=None, random_seed=123,
                 conv_width=9, num_features=512):
        self.seq_width = seq_width
        self.num_features = num_features
        self.conv_kernel = FHTMaxpoolConv1dFeatureExtractor(
            seq_width, num_features, conv_width=conv_width,
            random_seed=random_seed)
        self._device = None
        if device is not None:
            self.device = device

    @property
    def device(self):
        """Compute target (fast_conv.py:122-129).  TPU-native semantics
        match ModelBaseclass.device: reflects / sets the process-wide JAX
        default device rather than migrating arrays."""
        if self._device is not None:
            return self._device
        import jax
        return jax.default_backend()

    @device.setter
    def device(self, value):
        import jax
        if value not in ("cpu", "cuda", "gpu", "tpu"):
            raise RuntimeError(
                "Device must be in ['cpu', 'cuda', 'gpu', 'tpu'].")
        if value == "cpu":
            dev = jax.devices("cpu")[0]
        else:
            from .baseclass import ModelBaseclass
            dev = ModelBaseclass._resolve_accelerator(value)
        jax.config.update("jax_default_device", dev)
        self._device = value

    def predict(self, x_array, sequence_lengths, chunk_size=2000):
        """Extract (N, num_features) maxpool conv features
        (fast_conv.py:68-118)."""
        if sequence_lengths.shape[0] != x_array.shape[0]:
            raise RuntimeError(
                f"sequence_lengths has {sequence_lengths.shape[0]} entries "
                f"but x_array has {x_array.shape[0]} rows; one length per "
                "row is required.")
        feats = []
        for i in range(0, x_array.shape[0], chunk_size):
            cut = min(x_array.shape[0], i + chunk_size)
            if cut - i == 0:
                continue
            feats.append(np.asarray(self.conv_kernel.transform_x(
                x_array[i:cut, ...], sequence_lengths[i:cut])))
        return np.vstack(feats)
