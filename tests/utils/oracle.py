"""Slow, "idiot-proof" pure-numpy oracles for the random-feature ops,
following the reference test-suite's oracle pattern
(tests/fht_operations_tests/test_rbf_rfgen.py:26-115,
conv_testing_functions.py:44-90)."""
import numpy as np
from scipy.linalg import hadamard


def oracle_sorf_project(x, radem, num_freqs):
    """x: (N, d); radem: (3, B, P) +-1 floats. Returns (N, num_freqs)."""
    n, d = x.shape
    _, nblocks, p = radem.shape
    norm = 1.0 / np.sqrt(p)
    h_mat = hadamard(p).astype(np.float64)
    xp = np.zeros((n, p))
    xp[:, :d] = x
    out = np.zeros((n, nblocks * p))
    for b in range(nblocks):
        y = xp * radem[0, b] * norm
        y = y @ h_mat
        y = y * radem[1, b] * norm
        y = y @ h_mat
        y = y * radem[2, b] * norm
        y = y @ h_mat
        out[:, b * p:(b + 1) * p] = y
    return out[:, :num_freqs]


def oracle_positions(num_freqs, padded):
    """Independently recompute the block [cos|sin] layout positions."""
    cos_pos = np.zeros(num_freqs, dtype=np.int64)
    sin_pos = np.zeros(num_freqs, dtype=np.int64)
    col = 0
    i = 0
    while i < num_freqs:
        w = min(padded, num_freqs - i) if num_freqs > padded else num_freqs
        for j in range(w):
            cos_pos[i + j] = col + j
            sin_pos[i + j] = col + w + j
        col += 2 * w
        i += w
    return cos_pos, sin_pos


def oracle_assemble(cosv, sinv, padded):
    n, f = cosv.shape
    cos_pos, sin_pos = oracle_positions(f, padded)
    out = np.zeros((n, 2 * f))
    out[:, cos_pos] = cosv
    out[:, sin_pos] = sinv
    return out


def oracle_rbf_features(x, radem, chi, sigma, fit_intercept):
    """Block-layout cos/sin RBF features with reference scaling."""
    num_freqs = chi.shape[0]
    padded = radem.shape[-1]
    h = oracle_sorf_project(x * sigma, radem, num_freqs) * chi[None, :]
    scale = np.sqrt(1.0 / (num_freqs - 0.5)) if fit_intercept \
        else np.sqrt(1.0 / num_freqs)
    out = oracle_assemble(np.cos(h) * scale, np.sin(h) * scale, padded)
    if fit_intercept:
        out[:, 0] = 1.0
    return out


def oracle_conv_rbf_features(x, seq_lengths, radem, chi, sigma, width,
                             scaling_type=0):
    """Accumulated k-mer conv features (rbf_convolution.cpp:96-133)."""
    n, l, d = x.shape
    num_freqs = chi.shape[0]
    scale = np.sqrt(1.0 / num_freqs)
    cosa = np.zeros((n, num_freqs))
    sina = np.zeros((n, num_freqs))
    for i in range(n):
        nk = int(seq_lengths[i]) - width + 1
        if scaling_type == 1:
            row_scale = scale / np.sqrt(nk)
        elif scaling_type == 2:
            row_scale = scale / nk
        else:
            row_scale = scale
        for j in range(nk):
            window = (x[i, j:j + width, :] * sigma).reshape(1, -1)
            h = oracle_sorf_project(window, radem, num_freqs)[0] * chi
            cosa[i] += np.cos(h) * row_scale
            sina[i] += np.sin(h) * row_scale
    return oracle_assemble(cosa, sina, radem.shape[-1])


def oracle_conv_maxpool_features(x, seq_lengths, radem, chi, width):
    """ReLU + global-maxpool conv features (conv1d_operations.cpp)."""
    n, l, d = x.shape
    num_freqs = chi.shape[0]
    out = np.zeros((n, num_freqs))
    for i in range(n):
        nk = int(seq_lengths[i]) - width + 1
        for j in range(nk):
            window = x[i, j:j + width, :].reshape(1, -1)
            h = oracle_sorf_project(window, radem, num_freqs)[0] * chi
            out[i] = np.maximum(out[i], h)
    return out


def oracle_srht(x, radem_vec, sample_idx):
    """SRHT rows: FWHT(diag(radem) x / sqrt(P)) with column subsample."""
    n, d = x.shape
    p = radem_vec.shape[0]
    xp = np.zeros((n, p))
    xp[:, :d] = x
    y = (xp * radem_vec / np.sqrt(p)) @ hadamard(p).astype(np.float64)
    return y[:, sample_idx]
