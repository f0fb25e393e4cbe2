"""Model zoo: ANI model factories + serialization.

Equivalent of the reference's models/ani_models.py (`ANI2x_Model`,
`ANI1x_NR_Model`, `all_models`, `save_models`) — but models are parameter
pytrees + static specs, serialized as flat .npz archives instead of
TorchScript .pt files. Trained torchani weights can be imported with
models/loaders.py when available; factories default to deterministic
synthetic weights (this snapshot ships no trained checkpoints).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import aev as aevmod
from . import networks as netmod
from . import potential as potmod
from . import repulsion as repmod

ANI2X_SYMBOLS = ("H", "C", "N", "O", "S", "F", "Cl")
ANI1X_SYMBOLS = ("H", "C", "N", "O")


def ani2x(num_models: int = 8, seed: int = 0, dtype=jnp.float32,
          params=None, atom_chunk=None,
          repulsion: bool = False) -> potmod.ANIPotential:
    """ANI-2x architecture (reference models/ani_models.py:16-19).

    `params=None` -> deterministic synthetic ensemble weights.

    `repulsion=True` adds the XTB core-repulsion term (off in the
    reference's ANI-2x, models/ani_models.py:16-19, because trained
    weights learn short-range repulsion). The synthetic stand-in
    weights do not: without a core wall the liquid slowly collapses
    into the MLP's unphysical minima (density spikes, runaway atoms),
    so long synthetic-weight MD should opt in to stay in a stable
    liquid-like regime.
    """
    aev_spec = aevmod.ani2x_aev_spec()
    net_spec = netmod.NetworkSpec(aev_length=aev_spec.aev_length,
                                  hidden=netmod.ANI2X_HIDDEN)
    if params is None:
        params = netmod.init_network_params(
            net_spec, num_models, jax.random.PRNGKey(seed), dtype)
    rep = (repmod.RepulsionSpec.for_symbols(
        ANI2X_SYMBOLS, cutoff=5.1, cutoff_fn="smooth")
        if repulsion else None)
    spec = potmod.ANISpec(
        aev=aev_spec, net=net_spec,
        shifter=netmod.EnergyShifter(netmod.ANI2X_SELF_ENERGIES),
        repulsion=rep, symbols=ANI2X_SYMBOLS, atom_chunk=atom_chunk)
    return potmod.ANIPotential(spec=spec, params=params)


def ani1xnr(num_models: int = 8, seed: int = 1, dtype=jnp.float32,
            params=None, atom_chunk=None) -> potmod.ANIPotential:
    """ANI-1xnr architecture: ANI-1x AEV/nets + XTB repulsion
    (reference models/ani_models.py:22-56: RepulsionXTB cutoff=5.1,
    symbols=HCNO, cutoff_fn="smooth")."""
    aev_spec = aevmod.ani1x_aev_spec()
    net_spec = netmod.NetworkSpec(aev_length=aev_spec.aev_length,
                                  hidden=netmod.ANI1X_HIDDEN)
    if params is None:
        params = netmod.init_network_params(
            net_spec, num_models, jax.random.PRNGKey(seed), dtype)
    spec = potmod.ANISpec(
        aev=aev_spec, net=net_spec,
        shifter=netmod.EnergyShifter(netmod.ANI1X_SELF_ENERGIES),
        repulsion=repmod.RepulsionSpec.for_symbols(
            ANI1X_SYMBOLS, cutoff=5.1, cutoff_fn="smooth"),
        symbols=ANI1X_SYMBOLS, atom_chunk=atom_chunk)
    return potmod.ANIPotential(spec=spec, params=params)


all_models = {
    "ani2x": ani2x,
    "ani1x_nr": ani1xnr,
}


# ---------- serialization (the .pt-file equivalent) ----------

def save_potential(path, pot: potmod.ANIPotential):
    """Serialize spec + params to a single .npz (portable, no pickle)."""
    spec = pot.spec
    meta = {
        "aev": {k: getattr(spec.aev, k) for k in (
            "radial_cutoff", "angular_cutoff", "eta_r", "shf_r",
            "eta_a", "zeta", "shf_a", "shf_z", "num_species")},
        "net": {"aev_length": spec.net.aev_length,
                "hidden": spec.net.hidden,
                "celu_alpha": spec.net.celu_alpha},
        "self_energies": spec.shifter.self_energies,
        "symbols": spec.symbols,
        "repulsion": None if spec.repulsion is None else {
            "alpha": spec.repulsion.alpha, "zeff": spec.repulsion.zeff,
            "cutoff": spec.repulsion.cutoff, "k_f": spec.repulsion.k_f,
            "cutoff_fn": spec.repulsion.cutoff_fn},
    }
    arrays = {"__meta__": np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)}
    for s, layers in enumerate(pot.params):
        for li, layer in enumerate(layers):
            arrays[f"s{s}_l{li}_w"] = np.asarray(layer["w"])
            arrays[f"s{s}_l{li}_b"] = np.asarray(layer["b"])
    np.savez(path, **arrays)


def load_potential(path, dtype=jnp.float32) -> potmod.ANIPotential:
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        aev_spec = aevmod.AEVSpec(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in meta["aev"].items()})
        net_spec = netmod.NetworkSpec(
            aev_length=meta["net"]["aev_length"],
            hidden=tuple(tuple(h) for h in meta["net"]["hidden"]),
            celu_alpha=meta["net"]["celu_alpha"])
        rep = None
        if meta["repulsion"] is not None:
            r = meta["repulsion"]
            rep = repmod.RepulsionSpec(
                alpha=tuple(r["alpha"]), zeff=tuple(r["zeff"]),
                cutoff=r["cutoff"], k_f=r["k_f"], cutoff_fn=r["cutoff_fn"])
        params = []
        for s in range(net_spec.num_species):
            layers = []
            li = 0
            while f"s{s}_l{li}_w" in z:
                layers.append({
                    "w": jnp.asarray(z[f"s{s}_l{li}_w"], dtype),
                    "b": jnp.asarray(z[f"s{s}_l{li}_b"], dtype)})
                li += 1
            params.append(layers)
    spec = potmod.ANISpec(
        aev=aev_spec, net=net_spec,
        shifter=netmod.EnergyShifter(tuple(meta["self_energies"])),
        repulsion=rep, symbols=tuple(meta["symbols"]))
    return potmod.ANIPotential(spec=spec, params=params)
