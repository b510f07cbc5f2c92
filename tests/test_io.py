"""HSI I/O, normalization (incl. the reference's divide-by-max quirk),
augmentation parity between the numpy and on-device implementations."""

import os

import numpy as np
import pytest
import scipy.io as sio

import jax.numpy as jnp

from sshslie_tpu.utils.augment import augment_batch_jax, data_augmentation
from sshslie_tpu.utils.io_hsi import (
    global_normalization,
    inverse_global_normalization,
    inverse_per_channel_normalization,
    inverse_per_channel_standardization,
    load_hsi,
    per_channel_normalization,
    per_channel_standardization,
    save_hsi,
    select_hsi_wavelengths,
    self_normalization,
)


def test_save_load_roundtrip(tmp_path, rng):
    cube = rng.rand(8, 9, 5).astype(np.float32)
    path = save_hsi(str(tmp_path / "x.mat"), cube)
    out = load_hsi(path)
    np.testing.assert_array_equal(out, cube)


def test_save_custom_key_and_postfix(tmp_path, rng):
    cube = rng.rand(4, 4, 3).astype(np.float32)
    path = save_hsi(str(tmp_path / "y.mat"), cube, postfix="_R_low", key="ref")
    assert path.endswith("y_R_low.mat")
    assert np.allclose(sio.loadmat(path)["ref"], cube)


def test_v73_save_load_roundtrip(tmp_path, rng):
    cube = rng.rand(7, 9, 5).astype(np.float32)
    path = save_hsi(str(tmp_path / "h5.mat"), cube, fmt="v7.3")
    # scipy must refuse it (proves it's a real v7.3/HDF5 file) …
    with pytest.raises(NotImplementedError):
        sio.loadmat(path)
    # … and load_hsi must fall back to the HDF5 reader with MATLAB's logical
    # (H, W, C) axis order restored.
    out = load_hsi(path)
    np.testing.assert_array_equal(out, cube)


def test_v73_matches_matlab_axis_convention(tmp_path):
    # MATLAB v7.3 stores column-major: an (H, W, C) array appears as a
    # (C, W, H) HDF5 dataset. Write that layout by hand and check load_hsi
    # recovers the logical cube.
    import h5py

    cube = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    with h5py.File(tmp_path / "manual.mat", "w") as fh:
        fh.create_dataset("data", data=cube.transpose(2, 1, 0))
    out = load_hsi(str(tmp_path / "manual.mat"))
    np.testing.assert_array_equal(out, cube)


def test_v73_normalization_path(tmp_path, rng):
    cube = (rng.rand(6, 6, 4) * 4000).astype(np.float32)
    path = save_hsi(str(tmp_path / "n.mat"), cube, fmt="v7.3")
    out = load_hsi(path, normalization="global_normalization", max_val=4095.0)
    assert out.max() == pytest.approx(1.0)


def test_save_hsi_rejects_unknown_format(tmp_path, rng):
    with pytest.raises(ValueError):
        save_hsi(str(tmp_path / "b.mat"), rng.rand(2, 2, 2), fmt="v6")


def test_v73_missing_key_raises(tmp_path, rng):
    import h5py

    with h5py.File(tmp_path / "k.mat", "w") as fh:
        fh.create_dataset("other", data=rng.rand(2, 2))
    with pytest.raises(KeyError):
        load_hsi(str(tmp_path / "k.mat"), mat_key="data")


def test_load_missing_key_raises(tmp_path, rng):
    sio.savemat(tmp_path / "z.mat", {"other": rng.rand(2, 2, 2)})
    with pytest.raises(KeyError):
        load_hsi(str(tmp_path / "z.mat"), mat_key="data")


def test_global_normalization_clamps_and_rescales(tmp_path, rng):
    cube = (rng.rand(6, 6, 4) * 4000 + 100).astype(np.float32)
    sio.savemat(tmp_path / "g.mat", {"data": cube})
    out = load_hsi(str(tmp_path / "g.mat"), normalization="global_normalization",
                   max_val=4095.0, min_val=238.0)
    # Reference quirk (utils.py:57): output is additionally divided by its max,
    # so the max is exactly 1 even under global normalization.
    assert out.max() == pytest.approx(1.0)
    assert out.min() >= 0.0
    # Without the quirk the plain (x-min)/(max-min) is recovered.
    raw = load_hsi(str(tmp_path / "g.mat"), normalization="global_normalization",
                   max_val=4095.0, min_val=238.0, rescale_by_max=False)
    expected = np.clip((cube - 238.0) / (4095.0 - 238.0), 0.0, None)
    np.testing.assert_allclose(raw, expected, rtol=1e-6)


def test_normalization_inverses(rng):
    x = (rng.rand(5, 7, 3) * 100).astype(np.float32)
    g = global_normalization(x, max_val=100.0, min_val=0.0)
    np.testing.assert_allclose(inverse_global_normalization(g, 0.0, 100.0), x, rtol=1e-5)

    mins = x.min(axis=(0, 1), keepdims=True)
    maxs = x.max(axis=(0, 1), keepdims=True)
    pc = per_channel_normalization(x)
    np.testing.assert_allclose(
        inverse_per_channel_normalization(pc, mins, maxs), x, rtol=1e-5
    )

    means = x.mean(axis=(0, 1), keepdims=True)
    stds = x.std(axis=(0, 1), keepdims=True)
    ps = per_channel_standardization(x)
    np.testing.assert_allclose(
        inverse_per_channel_standardization(ps, means, stds), x, rtol=1e-4
    )

    np.testing.assert_allclose(self_normalization(x).max(), 1.0, rtol=1e-6)


def test_global_normalization_validation():
    x = np.ones((2, 2, 2), np.float32)
    with pytest.raises(ValueError):
        global_normalization(x)  # no max
    with pytest.raises(ValueError):
        global_normalization(x, max_val=1.0, min_val=2.0)


def test_select_hsi_wavelengths():
    # 204 bands 400-1000nm, drop 6 head / 6 tail, every 3rd → 64 bands
    wl, n = select_hsi_wavelengths(400, 1000, 204, 6, 6, 3)
    assert n == 64
    assert wl[0] == pytest.approx(400 + 6 * (600 / 203))
    wl2, n2 = select_hsi_wavelengths(400, 1000, 204, 6, 0, 3)
    assert n2 == 66


def test_augmentation_modes_match_numpy_ops(rng):
    img = rng.rand(6, 6, 3).astype(np.float32)
    assert np.array_equal(data_augmentation(img, 0), img)
    assert np.array_equal(data_augmentation(img, 1), np.flipud(img))
    assert np.array_equal(data_augmentation(img, 2), np.rot90(img))
    assert np.array_equal(data_augmentation(img, 4), np.rot90(img, 2))
    assert np.array_equal(data_augmentation(img, 7), np.flipud(np.rot90(img, 3)))
    with pytest.raises(ValueError):
        data_augmentation(img, 8)


def test_augment_batch_jax_matches_numpy(rng):
    batch = rng.rand(8, 6, 6, 3).astype(np.float32)
    modes = np.arange(8, dtype=np.int32)
    out = np.asarray(augment_batch_jax(jnp.asarray(batch), jnp.asarray(modes)))
    for i in range(8):
        np.testing.assert_array_equal(out[i], data_augmentation(batch[i], i))


def test_load_cube_specs_paths_with_equals(tmp_path, rng):
    """A bare path containing '=' in a directory name must not be split as
    'Label=path'; an explicit label still works."""
    from sshslie_tpu.utils.io_hsi import load_cube_specs

    d = tmp_path / "run=2"
    d.mkdir()
    cube = (rng.rand(8, 8, 3) * 100).astype(np.float32)
    sio.savemat(d / "c.mat", {"data": cube})
    specs = load_cube_specs([str(d / "c.mat"), f"GT={d / 'c.mat'}"])
    assert set(specs) == {"c", "GT"}
    np.testing.assert_allclose(specs["GT"], cube, rtol=1e-6)


def test_normalization_empty_string_means_none(tmp_path, rng):
    """'' (the YAML-friendly spelling the config enum accepts) must behave
    exactly like null — previously it raised NotImplementedError at the
    first cube load, hours after the enum check passed."""
    from sshslie_tpu.utils.io_hsi import load_hsi

    cube = (rng.rand(8, 8, 3) * 100).astype(np.float32)
    p = tmp_path / "c.mat"
    sio.savemat(p, {"data": cube})
    np.testing.assert_array_equal(
        load_hsi(str(p), normalization=""), load_hsi(str(p), normalization=None)
    )


def test_save_hsi_atomic(tmp_path, monkeypatch):
    """save_hsi is tmp+rename atomic: a failed write leaves no .tmp debris
    and never clobbers the previous good file."""
    import scipy.io as sio

    from sshslie_tpu.utils import io_hsi

    out = str(tmp_path / "cube.mat")
    good = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    io_hsi.save_hsi(out, good)
    assert sorted(os.listdir(tmp_path)) == ["cube.mat"]  # no stray .tmp

    def boom(path, data, key):
        with open(path, "wb") as fh:
            fh.write(b"half-written")
        raise OSError("disk full")

    monkeypatch.setattr(io_hsi, "_save_mat_v73", boom)
    with pytest.raises(OSError, match="disk full"):
        io_hsi.save_hsi(out, good * 2, fmt="v7.3")
    # previous good content intact, tmp cleaned up
    assert sorted(os.listdir(tmp_path)) == ["cube.mat"]
    np.testing.assert_array_equal(sio.loadmat(out)["data"], good)
