"""Checkpoint interop: reference PyTorch ``.pth`` and JAX-ecosystem Orbax.

Users of the reference train with torch and hold ``model_epoch_*.pth``
checkpoints (reference model.py:595-601: {epoch, model_state_dict,
optimizer_state_dict}) or bare state_dicts (main.py:200-205). This module maps
those tensors onto our Flax parameter tree so existing models run on TPU
unchanged — the same mapping the parity suite uses to prove bit-level
equivalence (tests/test_reference_parity.py).

Layout translation:
  * Conv2d       (out, in, kh, kw)   → HWIO (kh, kw, in, out)
  * ConvTranspose2d (in, out, kh, kw) → our (kh, kw, in, out)
  * Linear       (out, in)            → (in, out)

Loading ``.pth`` requires torch (CPU build is fine); import it before any
jax/TPU initialization in fresh processes.

Orbax (``export_orbax_checkpoint`` / ``import_orbax_checkpoint``) is the JAX
ecosystem's common on-disk format: exporting lets any downstream
orbax-based stack (``StandardCheckpointer``) restore our trained params
without this package; importing accepts params saved by such stacks as
``pretrained_model`` warm starts. Net-new interop — the reference has only
``.pth``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convT_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 0, 1)


def _lin_w(t) -> np.ndarray:
    return np.asarray(t).T


def torch_state_dict_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference ``LowLightEnhance`` state_dict to our param tree.

    Accepts numpy arrays or torch tensors as values. Raises KeyError with the
    missing name if the state_dict does not look like the reference model.
    """
    # Copy out of torch storage: .numpy() returns a VIEW of the live
    # parameter buffer, and jnp.asarray on the CPU backend zero-copy aliases
    # contiguous numpy arrays — without the copy, a torch optimizer stepping
    # the source model would silently mutate the converted params.
    sd = {k: (v.detach().cpu().numpy().copy() if hasattr(v, "detach")
              else np.array(v, copy=True))
          for k, v in state_dict.items()}

    def conv(prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": _conv_w(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"])}

    def lin(prefix: str) -> Dict[str, np.ndarray]:
        return {"kernel": _lin_w(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"])}

    decom = {
        "conv0": conv("decomposition_net.conv0.0"),
        "shallow_conv": conv("decomposition_net.shallow_conv.0"),
        "conv1": conv("decomposition_net.conv1.0"),
        "conv2": conv("decomposition_net.conv2.0"),
        "conv3": conv("decomposition_net.conv3.0"),
        "deconv": {
            "kernel": _convT_w(sd["decomposition_net.deconv.0.weight"]),
            "bias": np.asarray(sd["decomposition_net.deconv.0.bias"]),
        },
        "conv5": conv("decomposition_net.conv5.0"),
        "conv7": conv("decomposition_net.conv7.0"),
        "recon": conv("decomposition_net.recon"),
    }
    illum: Dict[str, Any] = {
        "conv0": conv("illum_adjust_net.conv0.0"),
        "conv1": conv("illum_adjust_net.conv1.0"),
        "conv2": conv("illum_adjust_net.conv2.0"),
        "conv3": conv("illum_adjust_net.conv3.0"),
        "deconv1": conv("illum_adjust_net.deconv1.0"),
        "deconv2": conv("illum_adjust_net.deconv2.0"),
        "deconv3": conv("illum_adjust_net.deconv3.0"),
        "feature_fusion": conv("illum_adjust_net.feature_fusion.0"),
        "final_conv": conv("illum_adjust_net.final_conv"),
    }
    if "illum_adjust_net.attn.q_linear.weight" in sd:
        illum["attn"] = {
            "q_linear": lin("illum_adjust_net.attn.q_linear"),
            "k_linear": lin("illum_adjust_net.attn.k_linear"),
            "v_linear": lin("illum_adjust_net.attn.v_linear"),
            "ff_linear1": lin("illum_adjust_net.attn.ff_linear1"),
            "ff_linear2": lin("illum_adjust_net.attn.ff_linear2"),
        }
    elif "illum_adjust_net.attn.fc1.weight" in sd:  # SEBlock variant
        illum["attn"] = {
            "fc1": lin("illum_adjust_net.attn.fc1"),
            "fc2": lin("illum_adjust_net.attn.fc2"),
        }
    return {"decomposition_net": decom, "illum_adjust_net": illum}


def flax_params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`torch_state_dict_to_flax`: emit a state_dict loadable
    by the reference ``LowLightEnhance`` (torch tensors, reference key names,
    OIHW/IOHW layouts). Lets TPU-trained weights run in the original repo."""
    import torch

    p = {k: np.asarray(v) for k, v in _flatten(params).items()}

    out: Dict[str, Any] = {}

    def put_conv(torch_prefix: str, ours: str) -> None:
        out[torch_prefix + ".weight"] = torch.tensor(
            p[ours + ".kernel"].transpose(3, 2, 0, 1))  # HWIO → OIHW
        out[torch_prefix + ".bias"] = torch.tensor(p[ours + ".bias"])

    def put_convT(torch_prefix: str, ours: str) -> None:
        out[torch_prefix + ".weight"] = torch.tensor(
            p[ours + ".kernel"].transpose(2, 3, 0, 1))  # HWIO → IOHW
        out[torch_prefix + ".bias"] = torch.tensor(p[ours + ".bias"])

    def put_lin(torch_prefix: str, ours: str) -> None:
        out[torch_prefix + ".weight"] = torch.tensor(p[ours + ".kernel"].T)
        out[torch_prefix + ".bias"] = torch.tensor(p[ours + ".bias"])

    d = "decomposition_net"
    for name in ("conv0", "shallow_conv", "conv1", "conv2", "conv3",
                 "conv5", "conv7"):
        put_conv(f"{d}.{name}.0", f"{d}.{name}")
    put_convT(f"{d}.deconv.0", f"{d}.deconv")
    put_conv(f"{d}.recon", f"{d}.recon")

    i = "illum_adjust_net"
    for name in ("conv0", "conv1", "conv2", "conv3",
                 "deconv1", "deconv2", "deconv3", "feature_fusion"):
        put_conv(f"{i}.{name}.0", f"{i}.{name}")
    put_conv(f"{i}.final_conv", f"{i}.final_conv")
    if f"{i}.attn.q_linear.kernel" in p:
        for name in ("q_linear", "k_linear", "v_linear",
                     "ff_linear1", "ff_linear2"):
            put_lin(f"{i}.attn.{name}", f"{i}.attn.{name}")
    elif f"{i}.attn.fc1.kernel" in p:
        for name in ("fc1", "fc2"):
            put_lin(f"{i}.attn.{name}", f"{i}.attn.{name}")
    return out


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
            flat.update(_flatten(dict(v), key))
        else:
            flat[key] = v
    return flat


def export_torch_checkpoint(params: Dict[str, Any], out_path: str,
                            epoch: Optional[int] = None,
                            lr: float = 1e-3) -> str:
    """Write our params as a reference-format ``.pth`` checkpoint
    ({epoch, model_state_dict, optimizer_state_dict}, reference
    model.py:595-601). The optimizer state is a fresh torch Adam over the
    same parameter count (empty moments) so the reference's
    ``load_checkpoint`` path (model.py:606 reads it unconditionally) works;
    optimizer moments do not transfer across frameworks."""
    import torch

    sd = flax_params_to_torch_state_dict(params)
    # Only the parameter COUNT matters for the emitted (empty) state dict —
    # 1-element dummies avoid cloning every model tensor, and building a
    # real Adam (vs a hand-written literal) keeps the group-options schema
    # correct across torch versions.
    opt = torch.optim.Adam(
        [torch.nn.Parameter(torch.zeros(1)) for _ in sd], lr=lr
    )
    payload: Dict[str, Any] = {
        "model_state_dict": sd,
        "optimizer_state_dict": opt.state_dict(),
    }
    if epoch is not None:
        payload["epoch"] = int(epoch)
    if not out_path.endswith(".pth"):
        out_path += ".pth"
    torch.save(payload, out_path)
    print(f"Exported params → {out_path}")
    return out_path


def load_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], Optional[int]]:
    """Load a reference ``.pth`` (full checkpoint or bare state_dict).

    Returns (flax_params, epoch-or-None).
    """
    import torch  # CPU build; must be imported before jax in fresh processes

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        # 'epoch: 0' is a legitimate value (0-based counters from non-
        # reference producers) — only a MISSING key maps to None.
        epoch = int(ckpt["epoch"]) if "epoch" in ckpt else None
        return torch_state_dict_to_flax(ckpt["model_state_dict"]), epoch
    return torch_state_dict_to_flax(ckpt), None


def import_torch_checkpoint(pth_path: str, out_path: str) -> str:
    """Convert a reference ``.pth`` into our msgpack params file (loadable by
    ``pretrained_model`` warm start). Returns the written path."""
    params, epoch = load_torch_checkpoint(pth_path)
    return _write_params_ckpt(params, out_path, epoch,
                              source=pth_path)


def _write_params_ckpt(params: Dict[str, Any], out_path: str,
                       epoch: Optional[int], source: str) -> str:
    """Write a params(-only) msgpack file in the warm-start format."""
    from flax import serialization

    payload = serialization.to_state_dict(params)
    if epoch is not None:
        payload = {"epoch": np.asarray(epoch, dtype=np.int64), "params": payload}
    blob = serialization.msgpack_serialize(payload)
    if not out_path.endswith(".ckpt"):
        out_path += ".ckpt"
    with open(out_path, "wb") as fh:
        fh.write(blob)
    print(f"Imported {source} → {out_path}")
    return out_path


def export_orbax_checkpoint(ckpt_path: str, out_dir: str) -> str:
    """Write a sshslie checkpoint's params as an Orbax StandardCheckpoint
    directory.

    Accepts any of our checkpoint flavors (full training checkpoint,
    params-only warm-start file) and emits the params pytree alone —
    optimizer moments are framework-internal and do not transfer. The
    output restores in any orbax-based stack::

        orbax.checkpoint.StandardCheckpointer().restore(out_dir)

    ``out_dir`` must not already exist (Orbax's atomicity contract).
    """
    import os

    import orbax.checkpoint as ocp

    from sshslie_tpu import checkpoints

    params = checkpoints.load_raw_params(ckpt_path)
    out_dir = os.path.abspath(out_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out_dir, params)
        ckptr.wait_until_finished()
    print(f"Exported {ckpt_path} → {out_dir} (Orbax StandardCheckpoint)")
    return out_dir


def import_orbax_checkpoint(orbax_dir: str, out_path: str) -> str:
    """Convert an Orbax StandardCheckpoint directory of our parameter tree
    into the msgpack params file ``pretrained_model`` warm-starts from.
    Returns the written path. Tree-structure mismatches surface at warm-start
    (flax ``from_state_dict`` names the missing/extra keys)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.abspath(orbax_dir))
    return _write_params_ckpt(params, out_path, None, source=orbax_dir)
