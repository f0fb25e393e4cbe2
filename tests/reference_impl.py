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


# ---------------------------------------------------------------------------
# Independent dynamics oracle (the role ASE VelocityVerlet plays for the
# reference, /root/reference/tests/test_lmp_with_ase.py:70-111: the
# integrator is written independently; the force field is supplied as a
# black-box callable)
# ---------------------------------------------------------------------------

_FTM2V = 1.0 / (48.88821291 * 48.88821291)  # LAMMPS `real` units
_MVV2E = 48.88821291 * 48.88821291
_BOLTZ = 0.0019872067
_NKTV2P = 68568.415


def ref_wrap(pos, box_h, origin):
    """Wrap into the primary (triclinic) cell by back-substitution."""
    h = np.asarray(box_h, np.float64)
    r = np.asarray(pos, np.float64) - origin
    f2 = r[:, 2] / h[2, 2]
    f1 = (r[:, 1] - f2 * h[2, 1]) / h[1, 1]
    f0 = (r[:, 0] - f1 * h[1, 0] - f2 * h[2, 0]) / h[0, 0]
    frac = np.stack([f0, f1, f2], 1)
    frac -= np.floor(frac)
    return origin + frac @ h


def ref_velocity_verlet(pos, vel, masses, force_fn, dt, n_steps,
                        box_h=None, origin=None, wrap_every=1,
                        nh=None, dof=None):
    """Naive velocity-Verlet (LAMMPS fix nve semantics), plain numpy.

    force_fn(pos) -> (pe [kcal/mol], force [n,3] kcal/mol/A, virial [3,3]).
    With `nh` (dict: temp, tdamp, chain) a Nose-Hoover chain thermostat
    brackets the step (fix nvt). Returns a list of per-step frames:
    dict(pos, vel, force, pe, ke, temp, press).
    """
    pos = np.array(pos, np.float64)
    vel = np.array(vel, np.float64)
    masses = np.asarray(masses, np.float64)
    n = len(masses)
    if dof is None:
        dof = 3 * n - 3
    pe, force, virial = force_fn(pos)
    eta_dot = np.zeros(nh["chain"]) if nh else None

    def nh_half(vel, eta_dot):
        """Martyna-Tuckerman NH-chain half step (independent derivation):
        quarter-kicks tail->head, velocity scale, quarter-kicks head->tail
        with the post-scale kinetic energy."""
        kt = _BOLTZ * nh["temp"]
        q = np.full(nh["chain"], kt * nh["tdamp"] ** 2)
        q[0] = dof * kt * nh["tdamp"] ** 2
        dts = dt / 2.0
        ke2 = _MVV2E * float(np.sum(masses[:, None] * vel * vel))
        g = np.zeros(nh["chain"])
        g[0] = (ke2 - dof * kt) / q[0]
        for k in range(1, nh["chain"]):
            g[k] = (q[k - 1] * eta_dot[k - 1] ** 2 - kt) / q[k]
        for k in range(nh["chain"] - 1, -1, -1):
            if k == nh["chain"] - 1:
                eta_dot[k] += 0.25 * dts * g[k]
            else:
                f = math.exp(-0.125 * dts * eta_dot[k + 1])
                eta_dot[k] = (eta_dot[k] * f + 0.25 * dts * g[k]) * f
        s = math.exp(-0.5 * dts * eta_dot[0])
        vel = vel * s
        ke2 = ke2 * s * s
        g[0] = (ke2 - dof * kt) / q[0]
        for k in range(nh["chain"]):
            if k == nh["chain"] - 1:
                gk = (q[k - 1] * eta_dot[k - 1] ** 2 - kt) / q[k] \
                    if k > 0 else g[0]
                eta_dot[k] += 0.25 * dts * gk
            else:
                f = math.exp(-0.125 * dts * eta_dot[k + 1])
                gk = g[0] if k == 0 else \
                    (q[k - 1] * eta_dot[k - 1] ** 2 - kt) / q[k]
                eta_dot[k] = (eta_dot[k] * f + 0.25 * dts * gk) * f
        return vel, eta_dot

    frames = []
    for step in range(n_steps):
        if box_h is not None and step % wrap_every == 0:
            pos = ref_wrap(pos, box_h, origin)
        if nh:
            vel, eta_dot = nh_half(vel, eta_dot)
        vel = vel + (0.5 * dt * _FTM2V) * force / masses[:, None]
        pos = pos + dt * vel
        pe, force, virial = force_fn(pos)
        vel = vel + (0.5 * dt * _FTM2V) * force / masses[:, None]
        if nh:
            vel, eta_dot = nh_half(vel, eta_dot)
        ke = 0.5 * _MVV2E * float(np.sum(masses[:, None] * vel * vel))
        vol = float(np.linalg.det(np.asarray(box_h, np.float64))) \
            if box_h is not None else 1.0
        kin = _MVV2E * np.einsum("i,ia,ib->ab", masses, vel, vel)
        press = float(np.trace(kin + virial) / 3.0 / vol * _NKTV2P)
        frames.append(dict(pos=pos.copy(), vel=vel.copy(),
                           force=np.array(force), pe=float(pe), ke=ke,
                           temp=2.0 * ke / (dof * _BOLTZ), press=press))
    return frames
