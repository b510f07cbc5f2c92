"""ENVI header/raw-pair I/O (utils/io_envi.py) — net-new input format with
no reference counterpart (reference utils.py reads .mat only)."""

import os

import numpy as np
import pytest

from sshslie_tpu.utils.io_envi import (
    envi_wavelengths,
    load_envi,
    read_envi_header,
    save_envi,
)
from sshslie_tpu.utils.io_hsi import load_hsi


@pytest.fixture
def cube(rng):
    return (rng.rand(5, 7, 3) * 1000).astype(np.float32)


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_round_trip_interleaves(tmp_path, cube, interleave):
    hdr, data = save_envi(str(tmp_path / "c.img"), cube, interleave=interleave)
    assert os.path.exists(hdr) and os.path.exists(data)
    out = load_envi(hdr)
    np.testing.assert_array_equal(out, cube)
    assert out.dtype == np.float32


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float64])
def test_round_trip_dtypes(tmp_path, rng, dtype):
    cube = (rng.rand(4, 6, 2) * 200).astype(dtype)
    hdr, _ = save_envi(str(tmp_path / "d"), cube, dtype=dtype)
    np.testing.assert_array_equal(load_envi(hdr), cube.astype(np.float32))


def test_big_endian_and_offset(tmp_path, cube):
    """Hand-written BE BSQ file with a header offset reads correctly."""
    raw = cube.transpose(2, 0, 1).astype(">f4")
    with open(tmp_path / "be.img", "wb") as fh:
        fh.write(b"\x00" * 16)  # 16-byte offset
        fh.write(raw.tobytes())
    (tmp_path / "be.hdr").write_text(
        "ENVI\nsamples = 7\nlines = 5\nbands = 3\ndata type = 4\n"
        "interleave = bsq\nbyte order = 1\nheader offset = 16\n"
    )
    np.testing.assert_array_equal(load_envi(str(tmp_path / "be.hdr")), cube)


def test_wavelengths_and_multiline_header(tmp_path, cube):
    hdr, _ = save_envi(str(tmp_path / "w"), cube,
                       wavelengths=[450.5, 550.0, 650.25])
    assert envi_wavelengths(hdr) == [450.5, 550.0, 650.25]
    # multi-line list form parses too
    (tmp_path / "ml.hdr").write_text(
        "ENVI\nsamples = 7\nlines = 5\nbands = 3\ndata type = 4\n"
        "wavelength = {450.5,\n 550.0,\n 650.25}\n"
    )
    h = read_envi_header(str(tmp_path / "ml.hdr"))
    assert h["wavelength"] == ["450.5", "550.0", "650.25"]


def test_errors(tmp_path, cube):
    hdr, data = save_envi(str(tmp_path / "e"), cube)
    os.remove(data)
    with pytest.raises(FileNotFoundError, match="no ENVI data file"):
        load_envi(hdr)
    # truncated data
    hdr2, data2 = save_envi(str(tmp_path / "t"), cube)
    with open(data2, "r+b") as fh:
        fh.truncate(10)
    with pytest.raises(ValueError, match="holds .* header promises"):
        load_envi(hdr2)
    # unsupported data type
    (tmp_path / "u.hdr").write_text(
        "ENVI\nsamples = 2\nlines = 2\nbands = 1\ndata type = 6\n")
    with pytest.raises(ValueError, match="unsupported ENVI data type"):
        load_envi(str(tmp_path / "u.hdr"))
    # not an ENVI header
    (tmp_path / "n.hdr").write_text("not a header\n")
    with pytest.raises(ValueError, match="ENVI header magic"):
        load_envi(str(tmp_path / "n.hdr"))


def test_load_hsi_dispatch_matches_mat_path(tmp_path, cube):
    """load_hsi('.hdr') applies the exact same normalization pipeline as the
    .mat path (reference utils.py:36-57 semantics)."""
    import scipy.io as sio

    hdr, _ = save_envi(str(tmp_path / "n"), cube)
    sio.savemat(str(tmp_path / "n.mat"), {"data": cube})
    kw = dict(normalization="global_normalization", max_val=4095.0,
              min_val=0.0)
    np.testing.assert_array_equal(
        load_hsi(hdr, **kw), load_hsi(str(tmp_path / "n.mat"), **kw)
    )


def test_training_on_envi_dataset(tmp_path, rng):
    """End-to-end: a directory of ENVI pairs trains through the standard
    store/Trainer path via the data_pattern config key."""
    from sshslie_tpu.config import Config
    from sshslie_tpu.data.datasets import LazyCubeStore, store_from_config
    from sshslie_tpu.train import Trainer

    d = tmp_path / "envi_train"
    d.mkdir()
    for i in range(2):
        save_envi(str(d / f"c{i}"), (rng.rand(24, 24, 6) * 90).astype(np.float32),
                  interleave=("bil", "bip")[i % 2])
    cfg = Config(channels=6, patch_size=16, batch_size=2, epoch=1,
                 eval_every_epoch=100, plot_every_epoch=100,
                 attention_impl="xla", data_pattern="*.hdr",
                 normalization="self")
    cfg.finalize()
    store = store_from_config(cfg, str(d))
    assert len(store) == 2 and store.channels == 6
    trainer = Trainer(cfg, channels=6)
    trainer.fit(store, ckpt_dir=str(tmp_path / "ck"))
    assert np.isfinite(trainer.all_epoch_losses["total_loss"][0])

    # lazy store reads shapes from the text headers without touching pixels
    lazy = LazyCubeStore(str(d), pattern="*.hdr", normalization="self")
    assert lazy.shapes == [(24, 24, 6), (24, 24, 6)]
    assert lazy.load_count == 0


def test_viz_cli_wave_range_from_envi_header(tmp_path, rng, monkeypatch):
    """--wave_start/--wave_end auto-fill from an ENVI header's wavelength
    list, and an ENVI cube without wavelengths still errors actionably."""
    hdr, _ = save_envi(str(tmp_path / "cap"),
                       (rng.rand(24, 24, 6) * 100).astype(np.float32),
                       wavelengths=[450, 500, 550, 600, 650, 700])
    from sshslie_tpu.viz import main as viz_main

    out = str(tmp_path / "fig.png")
    viz_main(["--cube", hdr, "--out", out, "--preset", "true"])
    assert os.path.exists(out)

    bare, _ = save_envi(str(tmp_path / "bare"),
                        (rng.rand(8, 8, 3) * 10).astype(np.float32))
    with pytest.raises(SystemExit, match="wave_start"):
        viz_main(["--cube", bare, "--out", str(tmp_path / "f2.png")])

def test_header_brace_leak_rejected(tmp_path):
    """A block whose closing line carries trailing content must be rejected,
    not silently re-parsed as scalar fields (advisor r3: prose like
    'samples = 9999' leaking from a truncated block could shadow the real
    field)."""
    from sshslie_tpu.utils.io_envi import read_envi_header

    hdr = tmp_path / "leak.hdr"
    hdr.write_text(
        "ENVI\nsamples = 4\nlines = 4\nbands = 2\ndata type = 4\n"
        "description = {note about braces} and then samples = 9999\n"
    )
    with pytest.raises(ValueError, match="trailing content"):
        read_envi_header(str(hdr))
    hdr2 = tmp_path / "unterminated.hdr"
    hdr2.write_text("ENVI\nsamples = 4\ndescription = {never closed\n")
    with pytest.raises(ValueError, match="unterminated"):
        read_envi_header(str(hdr2))
