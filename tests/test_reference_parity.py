"""End-to-end numerical parity against the actual PyTorch reference.

Loads /root/reference/model.py (with its optional deps stubbed), copies the
torch weights into our Flax parameter tree, and asserts that the full forward
pass (R, I, I_delta, S) and the six-term training loss agree to float32
precision on identical inputs. This is the ground-truth check behind the
≤0.1 dB PSNR parity target (BASELINE.md): same weights → same math.

Skipped when the reference checkout is not present.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "model.py")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_model_cls():
    """Import the reference LowLightEnhance with optional deps stubbed.

    Everything is undone afterwards: the stubs and the reference's
    generically-named modules ('model', 'utils', ...) must not leak into
    later test files — a leaked 'mlflow' stub (no set_experiment) breaks
    MLflowShim, and the reference's own main.py would shadow ours."""
    stubbed = []
    for name in ("mlflow", "torchinfo", "skimage", "skimage.metrics"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    sys.modules["torchinfo"].summary = lambda *a, **k: "stub"
    tm = types.ModuleType("torchmetrics")
    tmf = types.ModuleType("torchmetrics.functional")
    tmi = types.ModuleType("torchmetrics.functional.image")
    for fn in ("peak_signal_noise_ratio", "structural_similarity_index_measure",
               "spectral_angle_mapper"):
        setattr(tmi, fn, lambda *a, **k: None)
    for name, mod in (("torchmetrics", tm), ("torchmetrics.functional", tmf),
                      ("torchmetrics.functional.image", tmi)):
        if name not in sys.modules:
            sys.modules[name] = mod
            stubbed.append(name)
    sys.modules["skimage.metrics"].peak_signal_noise_ratio = None
    sys.modules["skimage.metrics"].structural_similarity = None
    pre_import = set(sys.modules)
    sys.path.insert(0, REFERENCE)
    try:
        import model as ref_model  # noqa: F401

        yield ref_model.LowLightEnhance
    finally:
        try:
            sys.path.remove(REFERENCE)
        except ValueError:
            pass
        for name in stubbed:
            sys.modules.pop(name, None)
        # Drop modules the reference import pulled in under generic names.
        for name in set(sys.modules) - pre_import:
            mod_file = getattr(sys.modules[name], "__file__", "") or ""
            if mod_file.startswith(REFERENCE):
                sys.modules.pop(name, None)


def torch_to_flax_params(ref) -> dict:
    """Shared production mapping (sshslie_tpu/interop.py) as jnp arrays."""
    from sshslie_tpu.interop import torch_state_dict_to_flax

    return jax.tree.map(jnp.asarray, torch_state_dict_to_flax(ref.state_dict()))


@pytest.fixture(scope="module")
def paired_models(ref_model_cls):
    torch.manual_seed(0)
    C = 8
    ref = ref_model_cls(input_channels=C, device=torch.device("cpu"))
    ref.eval()
    from sshslie_tpu.models.enhance import LowLightEnhanceNet

    ours = LowLightEnhanceNet(input_channels=C, attention_impl="xla")
    params = torch_to_flax_params(ref)
    return ref, ours, params, C


def test_forward_parity(paired_models, rng):
    ref, ours, params, C = paired_models
    x = rng.rand(2, 24, 24, C).astype(np.float32)
    with torch.no_grad():
        R_t, I_t, Id_t, S_t = ref.forward(torch.tensor(x.transpose(0, 3, 1, 2)))
    R_j, I_j, Id_j, S_j = ours.apply({"params": params}, jnp.asarray(x))
    for name, tj, tt in (("R", R_j, R_t), ("I", I_j, I_t),
                         ("I_delta", Id_j, Id_t), ("S", S_j, S_t)):
        want = tt.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(tj), want, atol=2e-5,
                                   err_msg=f"{name} mismatch")


def test_loss_parity(paired_models, rng):
    ref, ours, params, C = paired_models
    x = rng.rand(2, 24, 24, C).astype(np.float32)
    with torch.no_grad():
        total_t, terms_t = ref.compute_loss(torch.tensor(x.transpose(0, 3, 1, 2)))

    from sshslie_tpu.ops.losses import total_loss
    from sshslie_tpu.models.enhance import LowLightEnhanceNet

    outs = ours.apply({"params": params}, jnp.asarray(x),
                      method=LowLightEnhanceNet.forward_with_redecomposition)
    R, I, Id, S, R_enh = outs
    coeffs = {
        "c_loss_reconstruction": ref.c_loss_reconstruction,
        "c_loss_r_fidelity": ref.c_loss_r_fidelity,
        "c_loss_i_smooth_low": ref.c_loss_i_smooth_low,
        "c_loss_i_smooth_delta": ref.c_loss_i_smooth_delta,
        "c_loss_fourier": ref.c_loss_fourier,
        "c_loss_spectral_cons": ref.c_loss_spectral_cons,
        "alpha_i_smooth_low": ref.alpha_i_smooth_low,
        "alpha_i_smooth_delta": ref.alpha_i_smooth_delta,
    }
    total_j, terms_j = total_loss(jnp.asarray(x), R, I, Id, S, R_enh, coeffs)
    for key in ("L_reconstruction", "L_R_fidelity", "L_I_smooth_low",
                "L_I_smooth_delta", "L_fourier", "L_spectral_cons"):
        assert float(terms_j[key]) == pytest.approx(terms_t[key], abs=2e-5), key
    assert float(total_j) == pytest.approx(float(total_t), rel=1e-4)


def test_full_resolution_parity(paired_models, rng):
    """Full-cube (eval/test path) forward parity at a non-training size."""
    ref, ours, params, C = paired_models
    x = rng.rand(1, 64, 48, C).astype(np.float32)
    with torch.no_grad():
        _, _, _, S_t = ref.forward(torch.tensor(x.transpose(0, 3, 1, 2)))
    _, _, _, S_j = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(S_j), S_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


def test_psnr_equivalence_of_outputs(paired_models, rng):
    """The parity bound in metric terms: PSNR(ours vs torch) ≫ 60 dB, far
    inside the ≤0.1 dB target of BASELINE.md."""
    ref, ours, params, C = paired_models
    x = rng.rand(1, 32, 32, C).astype(np.float32)
    with torch.no_grad():
        _, _, _, S_t = ref.forward(torch.tensor(x.transpose(0, 3, 1, 2)))
    _, _, _, S_j = ours.apply({"params": params}, jnp.asarray(x))
    from sshslie_tpu.metrics import psnr

    cross = float(psnr(jnp.asarray(np.asarray(S_j)[0]),
                       jnp.asarray(S_t.numpy().transpose(0, 2, 3, 1)[0]), 1.0))
    assert cross > 60.0, cross


def test_pth_checkpoint_import_cli(paired_models, tmp_path, rng):
    """scripts/import_torch_checkpoint.py converts a real .pth into a warm-
    startable params file whose outputs match the torch model."""
    ref, ours, params, C = paired_models
    pth = tmp_path / "model_epoch_latest.pth"
    torch.save({"epoch": 7, "model_state_dict": ref.state_dict(),
                "optimizer_state_dict": {}}, str(pth))

    from sshslie_tpu.interop import import_torch_checkpoint
    out = import_torch_checkpoint(str(pth), str(tmp_path / "imported"))

    from sshslie_tpu import checkpoints
    loaded, epoch = checkpoints.load_pretrained_params(out, params)
    assert epoch == 7
    x = rng.rand(1, 16, 16, C).astype(np.float32)
    with torch.no_grad():
        _, _, _, S_t = ref.forward(torch.tensor(x.transpose(0, 3, 1, 2)))
    _, _, _, S_j = ours.apply({"params": loaded}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(S_j), S_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


def test_epoch_zero_checkpoint_import(paired_models, tmp_path):
    """'epoch: 0' is a legitimate stored value (0-based external producers)
    and must survive import — only a MISSING key maps to None."""
    ref, _, _, _ = paired_models
    pth = tmp_path / "e0.pth"
    torch.save({"epoch": 0, "model_state_dict": ref.state_dict()}, str(pth))
    from sshslie_tpu.interop import load_torch_checkpoint
    _, epoch = load_torch_checkpoint(str(pth))
    assert epoch == 0


def test_bare_state_dict_import(paired_models, tmp_path):
    ref, ours, params, C = paired_models
    pth = tmp_path / "bare.pth"
    torch.save(ref.state_dict(), str(pth))
    from sshslie_tpu.interop import load_torch_checkpoint
    flax_params, epoch = load_torch_checkpoint(str(pth))
    assert epoch is None
    a = jax.tree.leaves(flax_params)
    b = jax.tree.leaves(params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_training_trajectory_parity(ref_model_cls, rng):
    """Trained-parity loop (VERDICT r1 missing #2): feed the IDENTICAL batch
    stream to the reference torch train loop (model.py:300-316: zero_grad /
    backward / Adam step) and to make_train_step, both starting from the same
    transplanted weights, and assert per-step loss agreement plus final
    cross-PSNR ≫ the 0.1 dB parity budget.

    This closes the gap between weight-transplant forward parity (one point
    in weight space) and *trained* parity (the whole optimization path:
    grads, Adam moments, update order)."""
    torch.manual_seed(3)
    C, B, P, N_STEPS, LR = 8, 2, 24, 30, 1e-3
    ref = ref_model_cls(input_channels=C, lr=LR, device=torch.device("cpu"))
    params = torch_to_flax_params(ref)

    # One recorded patch stream, same numbers for both frameworks.
    batches = [rng.rand(B, P, P, C).astype(np.float32) for _ in range(N_STEPS)]

    # --- reference side: the train_model inner-loop body (model.py:313-316)
    torch_losses = []
    for x in batches:
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        total, _ = ref.compute_loss(xt)
        ref.optimizer.zero_grad()
        total.backward()
        ref.optimizer.step()
        torch_losses.append(float(total.item()))

    # --- our side: jitted train step from the SAME initial weights
    from sshslie_tpu.config import Config
    from sshslie_tpu.train import (
        TrainState, build_model, loss_coeffs, make_optimizer, make_train_step,
    )

    cfg = Config(channels=C, patch_size=P, batch_size=B, attention_impl="xla")
    model = build_model(cfg, C)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, loss_coeffs(cfg))
    jax_losses = []
    for x in batches:
        state, terms = step(state, jnp.asarray(x), jnp.float32(LR))
        jax_losses.append(float(terms["total_loss"]))

    # Per-step losses track each other; float32 drift compounds, so the
    # tolerance is looser than the single-step 2e-5 but still far inside
    # anything metric-visible.
    for i, (lt, lj) in enumerate(zip(torch_losses, jax_losses)):
        assert lj == pytest.approx(lt, rel=5e-3), (
            f"step {i}: torch={lt:.6f} jax={lj:.6f}"
        )

    # Final models produce near-identical enhancements on a held-out cube.
    from sshslie_tpu.metrics import psnr

    x = rng.rand(1, 32, 32, C).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        _, _, _, S_t = ref.forward(torch.tensor(x.transpose(0, 3, 1, 2)))
    _, _, _, S_j = model.apply({"params": state.params}, jnp.asarray(x))
    cross = float(psnr(jnp.asarray(np.asarray(S_j)[0]),
                       jnp.asarray(S_t.numpy().transpose(0, 2, 3, 1)[0]), 1.0))
    # ~44 dB measured: float32 reassociation differences (convs, FFT) are
    # amplified by Adam's early-step normalization (second moments ≈ 0 make
    # the update direction sensitive to 1e-7-scale gradient noise). At >40 dB
    # the two predictions differ by <0.01 RMS in [0,1] — perturbing a
    # PSNR-vs-GT metric in the ~20 dB regime by ≪ the 0.1 dB parity budget.
    assert cross > 40.0, f"trained cross-PSNR {cross:.2f} dB"


def test_seblock_illum_variant_parity(ref_model_cls, rng):
    """The SEBlock attention variant (reference model.py:122 use_attention,
    selectable only by editing the default there; a config key here) must
    also match numerically under weight transplant — P5's second half."""
    import model as ref_module  # loaded by the ref_model_cls fixture

    torch.manual_seed(11)
    C = 8
    ref_net = ref_module.IllumAdjustmentNet(
        in_channels=C, channel=16, use_attention=True, use_transformer=False
    )
    ref_net.eval()

    from sshslie_tpu.models.illum_adjust import IllumAdjustmentNet

    ours = IllumAdjustmentNet(in_channels=C, channel=16,
                              use_attention=True, use_transformer=False)
    # Transplant via the shared conversion helpers on a prefixed state_dict.
    sd = {f"illum_adjust_net.{k}": v for k, v in ref_net.state_dict().items()}
    # Fill the decomposition side with a throwaway net so the full mapper runs.
    full_ref = ref_module.LowLightEnhance(input_channels=C, device=torch.device("cpu"))
    sd.update({k: v for k, v in full_ref.state_dict().items()
               if k.startswith("decomposition_net.")})
    from sshslie_tpu.interop import torch_state_dict_to_flax

    params = jax.tree.map(jnp.asarray,
                          torch_state_dict_to_flax(sd)["illum_adjust_net"])
    assert "fc1" in params["attn"], "SEBlock weights must map via interop"

    I = rng.rand(2, 24, 24, 1).astype(np.float32)
    R = rng.rand(2, 24, 24, C).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.tensor(I.transpose(0, 3, 1, 2)),
                       torch.tensor(R.transpose(0, 3, 1, 2)))
    got = ours.apply({"params": params}, jnp.asarray(I), jnp.asarray(R))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )


def test_export_roundtrip_and_reference_load(paired_models, tmp_path, rng):
    """Our params → reference .pth → loads into the actual reference model
    and reproduces our forward; and importing the export back is identity."""
    from sshslie_tpu.interop import (
        export_torch_checkpoint,
        load_torch_checkpoint,
    )

    ref, ours, params, C = paired_models
    host_params = jax.tree.map(np.asarray, params)
    pth = export_torch_checkpoint(host_params, str(tmp_path / "export"), epoch=7)

    # identity round-trip through the torch format
    back, epoch = load_torch_checkpoint(pth)
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(host_params),
                    jax.tree.leaves(jax.tree.map(np.asarray, back))):
        np.testing.assert_array_equal(a, b)

    # the reference model must accept and reproduce the forward
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    ref2 = type(ref)(input_channels=C, device=torch.device("cpu"))
    ref2.load_state_dict(ckpt["model_state_dict"])
    ref2.eval()
    x = rng.rand(1, 16, 16, C).astype(np.float32)
    with torch.no_grad():
        _, _, _, S_t = ref2.forward(torch.tensor(x.transpose(0, 3, 1, 2)))
    _, _, _, S_j = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(S_j),
                               S_t.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_interop_script_mains_roundtrip(paired_models, tmp_path):
    """The import/export CLI mains (not just the library functions): a
    reference .pth imports to our format, our checkpoint exports to a .pth
    the reference model loads — full circle through argv parsing."""
    import scripts.export_torch_checkpoint as exp
    import scripts.import_torch_checkpoint as imp

    from sshslie_tpu import checkpoints

    ref, ours, params, C = paired_models
    pth = tmp_path / "ref.pth"
    torch.save({"epoch": 3, "model_state_dict": ref.state_dict(),
                "optimizer_state_dict": {}}, str(pth))

    imported = tmp_path / "imported"
    imp.main([str(pth), str(imported)])
    loaded, epoch = checkpoints.load_pretrained_params(str(imported), params)
    assert epoch == 3

    ours_ckpt = tmp_path / "ours.ckpt"
    checkpoints.save_checkpoint(str(ours_ckpt), params, None, 5)
    out_pth = tmp_path / "export.pth"
    exp.main(["--checkpoint", str(ours_ckpt), "--channels", str(C),
              "--out", str(out_pth)])
    ck = torch.load(str(out_pth), map_location="cpu", weights_only=False)
    ref2 = type(ref)(input_channels=C, device=torch.device("cpu"))
    ref2.load_state_dict(ck["model_state_dict"])  # loads cleanly
    assert ck["epoch"] == 5


def test_orbax_export_import_roundtrip(paired_models, tmp_path):
    """Orbax interop (net-new vs the reference, which ships .pth only):
    export our checkpoint as a StandardCheckpoint dir, restore it with plain
    orbax (no sshslie loaders), and re-import it as a warm-start params file
    — leaf equality through the full circle, driven via the script mains."""
    pytest.importorskip("orbax.checkpoint")
    import orbax.checkpoint as ocp

    import scripts.export_orbax_checkpoint as exp
    import scripts.import_orbax_checkpoint as imp
    from sshslie_tpu import checkpoints

    _, _, params, _ = paired_models
    ours_ckpt = tmp_path / "ours.ckpt"
    checkpoints.save_checkpoint(str(ours_ckpt), params, None, 5)

    orbax_dir = tmp_path / "orbax_params"
    exp.main([str(ours_ckpt), str(orbax_dir)])

    # A third-party orbax stack restores it without this package.
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(str(orbax_dir))
    ra, pa = jax.tree.leaves(restored), jax.tree.leaves(params)
    assert len(ra) == len(pa)
    for a, b in zip(ra, pa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    imported = tmp_path / "imported.ckpt"
    imp.main([str(orbax_dir), str(imported)])
    loaded, epoch = checkpoints.load_pretrained_params(str(imported), params)
    assert epoch is None
    for a, b in zip(jax.tree.leaves(loaded), pa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
