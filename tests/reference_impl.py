"""Independent numpy reference implementation of the ANI potential.

Plays the role torchani plays for the reference's parity tests
(/root/reference/models/test_models.py): a separately-written oracle the
framework must agree with. Deliberately naive: explicit Python loops over
atoms and periodic images, O(N^2), no shared code with lammps_ani_tpu
beyond the hyperparameter dataclasses.
"""

from __future__ import annotations

import itertools
import math

import numpy as np


def cutoff_cosine(r, rc):
    return 0.5 * math.cos(math.pi * r / rc) + 0.5 if r <= rc else 0.0


def find_neighbors(pos, box_h, origin, cutoff, n_shell=1, periodic=True):
    """All (i, j, r_ij_vec) with 0 < |r| < cutoff, including periodic images.

    Returns for each atom i a list of (j_species_index_source, vec i->j).
    """
    n = len(pos)
    shifts = [np.zeros(3)]
    if periodic and box_h is not None:
        for sx, sy, sz in itertools.product(range(-n_shell, n_shell + 1), repeat=3):
            if (sx, sy, sz) != (0, 0, 0):
                shifts.append(sx * box_h[0] + sy * box_h[1] + sz * box_h[2])
    out = [[] for _ in range(n)]
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and np.allclose(s, 0.0):
                    continue
                vec = pos[j] + s - pos[i]  # i -> j
                r = float(np.linalg.norm(vec))
                if 0.0 < r < cutoff:
                    out[i].append((j, vec, r))
    return out


def ref_aev(spec, species, pos, box_h=None, origin=None, n_shell=1):
    """[n, aev_length] float64 AEVs. `spec` is an AEVSpec."""
    n = len(pos)
    pos = np.asarray(pos, np.float64)
    species = np.asarray(species)
    nbrs = find_neighbors(pos, box_h, origin, spec.radial_cutoff, n_shell,
                          periodic=box_h is not None)
    s_count = spec.num_species
    triu = spec.triu_index()
    n_etar, n_shfr = len(spec.eta_r), len(spec.shf_r)
    n_etaa, n_zeta = len(spec.eta_a), len(spec.zeta)
    n_shfa, n_shfz = len(spec.shf_a), len(spec.shf_z)

    aev = np.zeros((n, spec.aev_length))
    for i in range(n):
        if species[i] < 0:
            continue
        radial = np.zeros((s_count, n_etar, n_shfr))
        for (j, vec, r) in nbrs[i]:
            if species[j] < 0:
                continue
            fc = cutoff_cosine(r, spec.radial_cutoff)
            for a, eta in enumerate(spec.eta_r):
                for b, shf in enumerate(spec.shf_r):
                    radial[species[j], a, b] += 0.25 * math.exp(
                        -eta * (r - shf) ** 2
                    ) * fc
        ang_nbrs = [t for t in nbrs[i] if t[2] < spec.angular_cutoff
                    and species[t[0]] >= 0]
        angular = np.zeros((triu.max() + 1, n_etaa, n_zeta, n_shfa, n_shfz))
        for (jj, (j, vj, rj)) in enumerate(ang_nbrs):
            for (k, vk, rk) in ang_nbrs[jj + 1:]:
                cosang = float(np.dot(vj, vk) / (rj * rk))
                cosang = max(-1.0, min(1.0, cosang))
                theta = math.acos(0.95 * cosang)
                fcj = cutoff_cosine(rj, spec.angular_cutoff)
                fck = cutoff_cosine(rk, spec.angular_cutoff)
                p = triu[species[j], species[k]]
                for a, etaa in enumerate(spec.eta_a):
                    for b, zeta in enumerate(spec.zeta):
                        for c, shfa in enumerate(spec.shf_a):
                            f2 = math.exp(-etaa * ((rj + rk) / 2 - shfa) ** 2)
                            for d, shfz in enumerate(spec.shf_z):
                                f1 = ((1 + math.cos(theta - shfz)) / 2) ** zeta
                                angular[p, a, b, c, d] += 2 * f1 * f2 * fcj * fck
        aev[i] = np.concatenate([radial.ravel(), angular.ravel()])
    return aev


def celu(x, alpha=0.1):
    return np.maximum(0, x) + np.minimum(0, alpha * (np.exp(x / alpha) - 1))


def ref_mlp(layers, x, alpha=0.1):
    """layers: list of {"w": [m,i,o], "b": [m,o]} numpy; x: [n, in] -> [m, n]."""
    m = layers[0]["w"].shape[0]
    h = np.broadcast_to(x[None], (m, *x.shape)).astype(np.float64)
    for li, layer in enumerate(layers):
        h = np.einsum("mni,mio->mno", h, np.asarray(layer["w"], np.float64)) + \
            np.asarray(layer["b"], np.float64)[:, None, :]
        if li < len(layers) - 1:
            h = celu(h, alpha)
    return h[..., 0]


def ref_atomic_energies(net_params, spec_net, species, aev):
    """[n] ensemble-mean per-atom NN energies (no SAE)."""
    n = len(species)
    out = np.zeros(n)
    for i in range(n):
        s = species[i]
        if s < 0:
            continue
        e = ref_mlp([{k: np.asarray(v) for k, v in l.items()}
                     for l in net_params[s]], aev[i:i + 1],
                    spec_net.celu_alpha)
        out[i] = e.mean()
    return out
