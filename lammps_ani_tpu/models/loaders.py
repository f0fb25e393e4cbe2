"""Import trained ANI weights from external formats.

The reference consumes (a) TorchScript `.pt` exports of `LammpsANI`
(/root/reference/models/ani_models.py:112-122), (b) torchani builtin model
zoos, and (c) NeuroChem weight directories (ANI-1x/2x/1xnr published
format, loaded via info files — /root/reference/models/ani_models.py:22-56).
This module imports each into an `ANIPotential` params pytree:

  * `load_torch_state_dict` — a torch `state_dict` (or a `torch.save`d
    file / TorchScript archive: both expose state_dict without torchani
    installed, since TorchScript embeds its own code).
  * `load_neurochem` — NeuroChem network directories (.nnf/.wparam/.bparam),
    the published ANI weight distribution format.

No torchani dependency; torch (CPU) is only needed for .pt files and is
imported lazily.
"""

from __future__ import annotations

import re
import struct
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from . import aev as aevmod
from . import networks as netmod
from . import potential as potmod
from . import repulsion as repmod
from . import zoo

# torchani parameter naming:
#   Ensemble of ANIModel:  neural_networks.{m}.{S or idx}.layers.{i}.weight
#   common variants:       neural_networks.{m}.{S}.{i}.weight
#                          {m}.{S}.{i}.weight
#                          neural_networks.{S}.{i}.weight   (single model)
_KEY_RE = re.compile(
    r"^(?:model\.)?(?:neural_networks\.)?"
    r"(?:(\d+)\.)?"  # ensemble member
    r"([A-Z][a-z]?|\d+)\."  # species symbol or index
    r"(?:layers\.)?(\d+)\."  # sequential layer index
    r"(weight|bias)$"
)


def _parse_state_dict(sd, symbols):
    """dict of tensors -> params[species][layer]{w: [m,i,o], b: [m,o]}."""
    sym_to_idx = {s: i for i, s in enumerate(symbols)}
    entries = {}  # (member, species, seq, kind) -> np.ndarray
    for key, value in sd.items():
        m = _KEY_RE.match(key)
        if not m:
            continue
        member = int(m.group(1)) if m.group(1) is not None else 0
        sp = m.group(2)
        sp_idx = sym_to_idx[sp] if sp in sym_to_idx else int(sp)
        seq = int(m.group(3))
        kind = m.group(4)
        entries[(member, sp_idx, seq, kind)] = np.asarray(value)
    if not entries:
        raise ValueError("no recognizable ANI parameter keys found")
    members = sorted({k[0] for k in entries})
    species = sorted({k[1] for k in entries})
    params = []
    for s in range(max(species) + 1):
        seqs = sorted({k[2] for k in entries if k[1] == s and k[3] == "weight"})
        layers = []
        for seq in seqs:
            ws, bs = [], []
            for member in members:
                w = entries[(member, s, seq, "weight")]
                b = entries.get((member, s, seq, "bias"))
                ws.append(w.T)  # torch [out,in] -> ours [in,out]
                bs.append(b if b is not None else np.zeros(w.shape[0]))
            layers.append({"w": jnp.asarray(np.stack(ws), jnp.float32),
                           "b": jnp.asarray(np.stack(bs), jnp.float32)})
        params.append(layers)
    return params


def load_torch_state_dict(src, arch: str = "ani2x") -> potmod.ANIPotential:
    """Build an ANIPotential from a torch state_dict.

    `src` may be a dict of tensors/arrays, a path to a `torch.save`d
    state_dict, or a TorchScript archive (reference .pt export format).
    `arch`: "ani2x" | "ani1x" | "ani1xnr" — selects AEV hyperparameters,
    self-energies, and repulsion config.
    """
    if not isinstance(src, dict):
        import torch

        path = str(src)
        try:
            module = torch.jit.load(path, map_location="cpu")
            sd = module.state_dict()
        except Exception:
            obj = torch.load(path, map_location="cpu", weights_only=False)
            sd = obj if isinstance(obj, dict) else obj.state_dict()
        src = {k: v.detach().cpu().numpy() for k, v in sd.items()}

    factory = {"ani2x": zoo.ani2x, "ani1x": _ani1x_factory,
               "ani1xnr": zoo.ani1xnr}[arch]
    symbols = (zoo.ANI2X_SYMBOLS if arch == "ani2x" else zoo.ANI1X_SYMBOLS)
    params = _parse_state_dict(src, symbols)
    base = factory(num_models=params[0][0]["w"].shape[0])
    _check_shapes(base.spec.net, params)
    return potmod.ANIPotential(spec=base.spec, params=params)


def _ani1x_factory(num_models=8, **kw):
    pot = zoo.ani1xnr(num_models=num_models, **kw)
    import dataclasses

    return potmod.ANIPotential(
        spec=dataclasses.replace(pot.spec, repulsion=None),
        params=pot.params)


def _check_shapes(net_spec, params):
    for s, layers in enumerate(params):
        want = net_spec.layer_dims(s)
        got = [(l["w"].shape[1], l["w"].shape[2]) for l in layers]
        if list(want) != got:
            raise ValueError(
                f"species {s}: layer dims {got} != architecture {want}")


# --------------------------- NeuroChem format ---------------------------

def _read_neurochem_layer(dir_path: Path, layer: int):
    """NeuroChem stores each linear layer as wparam/bparam float32 blobs."""
    w = np.fromfile(dir_path / f"l{layer}.wparam", dtype="<f4")
    b = np.fromfile(dir_path / f"l{layer}.bparam", dtype="<f4")
    return w, b


def _parse_nnf(path: Path):
    """Parse layer sizes from a NeuroChem .nnf network definition."""
    text = path.read_text()
    sizes = [int(m) for m in re.findall(r"nodes\s*=\s*(\d+)", text)]
    inputs = re.search(r"inputsize\s*=\s*(\d+)", text)
    return (int(inputs.group(1)) if inputs else None), sizes


def load_neurochem(
    root, symbols, arch: str = "ani1x", num_models: int | None = None
) -> potmod.ANIPotential:
    """Load a NeuroChem ensemble directory tree.

    Layout (published ANI models): root/train{i}/networks/ANN-{S}.nnf plus
    l{j}.wparam / l{j}.bparam blobs per species directory.
    """
    root = Path(root)
    train_dirs = sorted(root.glob("train*"))
    if num_models is not None:
        train_dirs = train_dirs[:num_models]
    if not train_dirs:
        raise ValueError(f"no train* member directories under {root}")

    per_member = []
    for td in train_dirs:
        netdir = td / "networks"
        member = []
        for s, sym in enumerate(symbols):
            sdirs = list(netdir.glob(f"ANN-{sym}*")) or [netdir / sym]
            sdir = sdirs[0]
            nnf = list(sdir.glob("*.nnf"))
            in_size, sizes = (_parse_nnf(nnf[0]) if nnf else (None, None))
            layers = []
            li = 0
            while (sdir / f"l{li}.wparam").exists():
                w, b = _read_neurochem_layer(sdir, li)
                d_out = len(b)
                d_in = len(w) // d_out
                layers.append((w.reshape(d_out, d_in).T, b))
                li += 1
            member.append(layers)
        per_member.append(member)

    n_species = len(symbols)
    params = []
    for s in range(n_species):
        n_layers = len(per_member[0][s])
        layers = []
        for li in range(n_layers):
            ws = np.stack([pm[s][li][0] for pm in per_member])
            bs = np.stack([pm[s][li][1] for pm in per_member])
            layers.append({"w": jnp.asarray(ws, jnp.float32),
                           "b": jnp.asarray(bs, jnp.float32)})
        params.append(layers)

    base = (zoo.ani2x if arch == "ani2x" else _ani1x_factory)(
        num_models=len(per_member))
    _check_shapes(base.spec.net, params)
    return potmod.ANIPotential(spec=base.spec, params=params)


def export_torch_state_dict(pot: potmod.ANIPotential, path,
                            symbols=None):
    """Write our params as a torchani-naming torch state_dict (.pt)."""
    import torch

    symbols = symbols or pot.spec.symbols
    sd = {}
    for s, layers in enumerate(pot.params):
        for li, layer in enumerate(layers):
            w = np.asarray(layer["w"])
            b = np.asarray(layer["b"])
            for member in range(w.shape[0]):
                prefix = f"neural_networks.{member}.{symbols[s]}.{2 * li}"
                sd[f"{prefix}.weight"] = torch.from_numpy(
                    np.ascontiguousarray(w[member].T))
                sd[f"{prefix}.bias"] = torch.from_numpy(
                    np.ascontiguousarray(b[member]))
    torch.save(sd, str(path))
