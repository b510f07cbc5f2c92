"""HSI cube I/O and normalization (host-side, pure numpy/scipy).

Functional parity with reference utils.py:36-178 (load/save + four
normalization modes and their inverses) and utils.py:208-237 (wavelength
selection), with the reference's quirks resolved explicitly:

  * The reference divides *every* normalized cube by its own max on the way out
    of ``load_hsi`` (reference utils.py:57), i.e. "global_normalization" output
    is additionally self-scaled per cube. That double-scaling is part of the
    training math the published results depend on, so we reproduce it by
    default; pass ``rescale_by_max=False`` for the un-quirked behavior.
  * ``save_hsi`` strips a hardcoded 4-char extension (reference utils.py:174);
    we split the extension properly.

Beyond the reference: MATLAB v7.3 (HDF5) files are supported transparently —
``load_hsi`` falls back to h5py when scipy refuses a v7.3 file, and
``save_hsi(..., fmt='v7.3')`` writes HDF5 for cubes past scipy's 2**31-byte
matrix limit. v7.3 stores arrays column-major, so axes are reversed on both
paths to keep the in-memory layout (H, W, C).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import scipy.io as sio


def _load_mat_v73(file: str, mat_key: str) -> np.ndarray:
    """Read one variable from a MATLAB v7.3 (HDF5) file.

    MATLAB writes column-major; h5py presents the raw layout, i.e. the axes
    arrive reversed ((C, W, H) for an (H, W, C) cube) — transpose restores
    MATLAB's logical order.
    """
    import h5py

    name = file if isinstance(file, str) else "<in-memory .mat>"
    with h5py.File(file, "r") as fh:
        if mat_key not in fh:
            raise KeyError(
                f"{name}: variable {mat_key!r} not found; available: "
                f"{[k for k in fh.keys() if not k.startswith('#')]}"
            )
        arr = np.asarray(fh[mat_key])
    return arr.transpose(tuple(reversed(range(arr.ndim))))


def _save_mat_v73(out: str, data: np.ndarray, key: str) -> None:
    """Write a v7.3-compatible HDF5 .mat: MATLAB 512-byte header userblock,
    reversed axes, and the MATLAB_class attribute."""
    import h5py

    data = np.asarray(data)
    with h5py.File(out, "w", userblock_size=512) as fh:
        dset = fh.create_dataset(
            key, data=data.transpose(tuple(reversed(range(data.ndim))))
        )
        # Derive the MATLAB class from the full dtype — width matters
        # (uint8 vs uint16 vs uint64 are distinct MATLAB classes).
        if data.dtype.kind == "f":
            kind = "double" if data.dtype.itemsize == 8 else "single"
        elif data.dtype.kind in ("i", "u"):
            kind = f"{'u' if data.dtype.kind == 'u' else ''}int{data.dtype.itemsize * 8}"
        else:
            kind = "double"
        dset.attrs["MATLAB_class"] = np.bytes_(kind)
    # MATLAB MAT-file header: descriptive text, then version 0x0200 + 'IM'
    # endian marker at bytes 124-127 (what scipy sniffs to report v7.3).
    header = b"MATLAB 7.3 MAT-file, written by sshslie_tpu; HDF5-based format"
    header = header.ljust(116) + b"\x00" * 8 + b"\x00\x02" + b"IM"
    with open(out, "r+b") as fh:
        fh.write(header)


def load_hsi(
    file: str,
    mat_key: str = "data",
    normalization: Optional[str] = None,
    max_val: Optional[float] = None,
    min_val: Optional[float] = None,
    rescale_by_max: bool = True,
) -> np.ndarray:
    """Load an (H, W, C) float32 cube from a MATLAB ``.mat`` file — or,
    for ``.hdr`` paths, from an ENVI header/raw pair (utils/io_envi.py;
    net-new, the reference reads .mat only).

    Normalization modes and the trailing divide-by-max match reference
    utils.py:36-57 exactly (including the clamp of negatives to zero after
    global normalization, reference utils.py:47).
    """
    if file.lower().endswith(".hdr"):
        from sshslie_tpu.utils.io_envi import load_envi

        return normalize_like_load(
            load_envi(file), normalization, max_val=max_val, min_val=min_val,
            rescale_by_max=rescale_by_max,
        )
    try:
        mat = sio.loadmat(file)
    except (NotImplementedError, ValueError):
        # scipy refuses MATLAB v7.3 (HDF5) files (NotImplementedError with a
        # MATLAB header, ValueError for bare HDF5) — read via h5py instead.
        import h5py

        if not h5py.is_hdf5(file):
            raise
        mat = {mat_key: _load_mat_v73(file, mat_key)}
    if mat_key not in mat:
        raise KeyError(
            f"{file}: variable {mat_key!r} not found; available: "
            f"{[k for k in mat if not k.startswith('__')]}"
        )
    x = np.asarray(mat[mat_key], dtype=np.float32)
    return normalize_like_load(
        x, normalization, max_val=max_val, min_val=min_val,
        rescale_by_max=rescale_by_max,
    )


# HDF5 file signature (the v7.3 .mat container). h5py.is_hdf5 takes only
# filesystem paths, so in-memory dispatch checks the magic directly.
_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def load_hsi_bytes(body: bytes, mat_key: str = "data") -> np.ndarray:
    """Parse an in-memory ``.mat`` payload (v7 via scipy, v7.3 via h5py on a
    BytesIO) with the same dispatch and key-missing diagnostics as
    :func:`load_hsi`; no normalization. Used by the serving HTTP layer.

    This parses UNTRUSTED wire bytes: every malformed-payload failure is
    normalized to ValueError (→ HTTP 400 in serve.py), never a raw
    scipy/h5py exception type the HTTP layer would map to a 5xx. A missing
    variable stays KeyError (also a 400, with the available keys)."""
    import io as _io

    try:
        mat = sio.loadmat(_io.BytesIO(body))
    except Exception as e:  # scipy raises several types on crafted input
        if body[: len(_HDF5_MAGIC)] == _HDF5_MAGIC:
            try:
                return np.asarray(_load_mat_v73(_io.BytesIO(body), mat_key),
                                  dtype=np.float32)
            except KeyError:
                raise
            except Exception as e73:  # truncated/crafted HDF5
                raise ValueError(
                    f"unreadable v7.3 .mat payload "
                    f"({type(e73).__name__}: {e73})"
                )
        raise ValueError(
            f"body is not a readable .mat payload ({type(e).__name__}: {e})"
        )
    if mat_key not in mat:
        raise KeyError(
            f"variable {mat_key!r} not found; available: "
            f"{[k for k in mat if not k.startswith('__')]}"
        )
    try:
        return np.asarray(mat[mat_key], dtype=np.float32)
    except (TypeError, ValueError) as e:
        # MATLAB cell/object/char variables don't coerce to a float cube.
        raise ValueError(
            f"variable {mat_key!r} is not a numeric cube "
            f"({type(e).__name__}: {e})"
        )


def split_cube_spec(spec: str) -> Tuple[str, str]:
    """'Label=path' → (label, path); bare paths → ('', path).

    Splits at the FIRST '=': 'GT=runs/x=2/c.mat' → label 'GT'. A prefix
    containing a path separator is not a label but a bare path whose
    directory name happens to contain '=' (e.g. results/run=2/c.mat)."""
    label, sep, path = spec.partition("=")
    if not sep or os.sep in label or "/" in label:
        return "", spec
    return label, path


def load_cube_specs(specs, mat_key: str = "data") -> dict:
    """Parse repeatable ``'Label=path.mat'`` / bare-path CLI specs into an
    ordered ``{label: float64 cube}`` dict (shared by the viz and
    inspect-spectra CLIs; loads v7 and v7.3 ``.mat`` alike).

    Bare paths label themselves by basename; duplicate labels get trailing
    underscores so every spec stays visible.
    """
    cubes: dict = {}
    for spec in specs:
        label, path = split_cube_spec(spec)
        label = label or os.path.splitext(os.path.basename(path))[0]
        while label in cubes:  # bare paths may share a basename
            label += "_"
        cubes[label] = np.asarray(
            load_hsi(path, mat_key=mat_key, normalization=None), dtype=np.float64
        )
    return cubes


def normalize_like_load(
    x: np.ndarray,
    normalization: Optional[str],
    max_val: Optional[float] = None,
    min_val: Optional[float] = None,
    rescale_by_max: bool = True,
) -> np.ndarray:
    """Apply ``load_hsi``'s normalization semantics to an in-memory cube
    (used by the serving path, which receives cubes over the wire)."""
    if normalization is None or normalization == "":
        # '' is the YAML-friendly spelling of null; both mean raw values
        # (config's enum accepts both — they must not diverge at load time).
        return x
    if normalization == "self":
        x = self_normalization(x)
    elif normalization == "global_normalization":
        x = global_normalization(x, max_val=max_val, min_val=min_val)
        x[x < 0] = 0.0
    elif normalization == "per_channel_normalization":
        x = per_channel_normalization(x)
    elif normalization == "per_channel_standardization":
        x = per_channel_standardization(x)
    else:
        raise NotImplementedError(f"{normalization} is not implemented")

    x = x.astype(np.float32)
    if rescale_by_max:
        # Reference quirk (utils.py:57): every normalized cube is additionally
        # divided by its own max.
        x = x / np.max(x)
    return x


def normalize_like_load_jnp(
    x,
    normalization: Optional[str],
    max_val: Optional[float] = None,
    min_val: Optional[float] = None,
    rescale_by_max: bool = True,
):
    """:func:`normalize_like_load` in jnp, for in-graph use (device-side
    request decode, serve.py): the server uploads a client's compact
    u16/bf16 payload as-is (2 bytes/value over the host↔device link — the
    bottleneck on relay/DCN transports) and dequantization + this
    normalization fuse into the forward's first ops.

    Same semantics as the host version, including the reference
    divide-by-own-max quirk (utils.py:57) and the global-normalization
    negative clamp. NOTE for padded inputs: 'self', 'global_normalization'
    and 'per_channel_normalization' are edge-pad-invariant (replicated
    values add no new extrema), 'per_channel_standardization' is NOT (mean/
    std shift) — callers that pad first must route that mode to the host
    path."""
    import jax.numpy as jnp

    if normalization is None or normalization == "":
        return x
    if normalization == "self":
        x = x / jnp.max(x)
    elif normalization == "global_normalization":
        if max_val is None:
            raise ValueError("max value is not provided for global normalization")
        lo = 0.0 if min_val is None else min_val
        if lo > max_val:
            raise ValueError("min value cannot be larger than the max value")
        x = (x - lo) / (max_val - lo)
        x = jnp.maximum(x, 0.0)
    elif normalization == "per_channel_normalization":
        min_vals = jnp.min(x, axis=(0, 1), keepdims=True)
        max_vals = jnp.max(x, axis=(0, 1), keepdims=True)
        range_vals = jnp.where(max_vals > min_vals, max_vals - min_vals, 1.0)
        x = (x - min_vals) / range_vals
    elif normalization == "per_channel_standardization":
        mean_vals = jnp.mean(x, axis=(0, 1), keepdims=True)
        std_vals = jnp.std(x, axis=(0, 1), keepdims=True)
        std_vals = jnp.where(std_vals > 0, std_vals, 1.0)
        x = (x - mean_vals) / std_vals
    else:
        raise NotImplementedError(f"{normalization} is not implemented")
    x = x.astype(jnp.float32)
    if rescale_by_max:
        x = x / jnp.max(x)
    return x


def save_hsi(
    filepath: str,
    data: np.ndarray,
    postfix: Optional[str] = None,
    key: str = "data",
    fmt: str = "auto",
) -> str:
    """Save an (H, W, C) cube to ``.mat`` under ``key`` (reference utils.py:171-178).

    Returns the path actually written. Unlike the reference, the extension is
    split with ``os.path.splitext`` rather than ``filepath[:-4]``.

    ``fmt``: 'v7' (scipy), 'v7.3' (HDF5 via h5py), or 'auto' — v7 unless the
    cube exceeds scipy's 2**31-byte matrix limit.

    Writes are atomic (tmp file + ``os.replace`` in the target directory):
    a crash or preemption mid-write can never leave a torn half-cube where
    metrics/plotting would later read it — the same contract as
    checkpoints.py. The reference writes in place (utils.py:178).
    """
    base, _ = os.path.splitext(filepath)
    if postfix:
        base += postfix
    out = base + ".mat"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    data = np.asarray(data)
    if fmt == "auto":
        fmt = "v7.3" if data.nbytes >= 2**31 else "v7"
    tmp = out + ".tmp"
    try:
        if fmt == "v7.3":
            _save_mat_v73(tmp, data, key)
        elif fmt == "v7":
            # appendmat=False: savemat would otherwise append '.mat' to the
            # '.tmp' name and the rename source would not exist.
            sio.savemat(tmp, {key: data}, appendmat=False)
        else:
            raise ValueError(
                f"unknown .mat format {fmt!r} (use 'v7', 'v7.3', 'auto')"
            )
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out


# --- normalization modes (reference utils.py:59-109) ---

def self_normalization(x: np.ndarray) -> np.ndarray:
    """Map the cube max to 1 (reference utils.py:89-93)."""
    return x / np.max(x)


def global_normalization(
    x: np.ndarray, max_val: Optional[float] = None, min_val: Optional[float] = None
) -> np.ndarray:
    """(x - min) / (max - min) with dataset-global bounds (reference utils.py:75-87)."""
    if max_val is None:
        raise ValueError("max value is not provided for global normalization")
    if min_val is None:
        min_val = 0.0
    if min_val > max_val:
        raise ValueError("min value cannot be larger than the max value")
    return (x - min_val) / (max_val - min_val)


def per_channel_normalization(x: np.ndarray) -> np.ndarray:
    """Min-max scale each spectral band independently (reference utils.py:59-73)."""
    min_vals = np.min(x, axis=(0, 1), keepdims=True)
    max_vals = np.max(x, axis=(0, 1), keepdims=True)
    range_vals = np.where(max_vals > min_vals, max_vals - min_vals, 1.0)
    return (x - min_vals) / range_vals


def per_channel_standardization(x: np.ndarray) -> np.ndarray:
    """Zero-mean unit-std per band (reference utils.py:95-109)."""
    mean_vals = np.mean(x, axis=(0, 1), keepdims=True)
    std_vals = np.std(x, axis=(0, 1), keepdims=True)
    std_vals = np.where(std_vals > 0, std_vals, 1.0)
    return (x - mean_vals) / std_vals


# --- inverses (reference utils.py:111-169) ---

def inverse_global_normalization(
    predictions: np.ndarray, global_min: float, global_max: float
) -> np.ndarray:
    return np.asarray(predictions) * (global_max - global_min) + global_min


def inverse_per_channel_normalization(
    predictions: np.ndarray, min_vals: np.ndarray, max_vals: np.ndarray
) -> np.ndarray:
    return np.asarray(predictions) * (max_vals - min_vals) + min_vals


def inverse_per_channel_standardization(
    predictions: np.ndarray, mean_vals: np.ndarray, std_vals: np.ndarray
) -> np.ndarray:
    return np.asarray(predictions) * std_vals + mean_vals


# --- wavelength selection (reference utils.py:208-237) ---

def select_hsi_wavelengths(
    range_start: float,
    range_end: float,
    total_channels: int,
    d_head: int,
    d_tail: int,
    s: int = 3,
) -> Tuple[np.ndarray, int]:
    """Wavelengths (nm) of retained bands: drop head/tail, keep every s-th."""
    wavelengths = np.linspace(range_start, range_end, total_channels)
    remaining = wavelengths[d_head:-d_tail] if d_tail > 0 else wavelengths[d_head:]
    selected = remaining[::s]
    return selected, len(selected)


# --- LR schedule helpers (reference utils.py:180-206; kept for API parity) ---

def adaptive_lr(
    num_epochs: int, divide_period: int, divide_by: float, initial_value: float
) -> np.ndarray:
    """Piecewise-constant LR array divided by ``divide_by`` every period."""
    arr = np.zeros(num_epochs)
    current = initial_value
    for i in range(0, num_epochs, divide_period):
        arr[i : i + divide_period] = current
        current /= divide_by
    return arr


def polynomial_decay(
    initial_value: float, decay_rate: float, power: float, step: float
) -> float:
    return initial_value / (1 + decay_rate * step) ** power
