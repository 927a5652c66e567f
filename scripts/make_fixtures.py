"""Generate synthetic evaluation fixtures: .off meshes + gt/input .xyz sets.

Creates PU1K-protocol-shaped fixtures (input 2048 -> gt 8192) from analytic
surfaces so the full eval chain (upsample CLI -> p2f -> evaluate CLI) can run
without the unreleased dataset downloads.

usage: python scripts/make_fixtures.py <out_dir> [n_shapes]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def icosphere(subdiv: int = 4):
    """Subdivided icosahedron on the unit sphere -> (verts, faces)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = verts.tolist()
    cache = {}

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in cache:
            m = np.asarray(verts[a]) + np.asarray(verts[b])
            m /= np.linalg.norm(m)
            cache[key] = len(verts)
            verts.append(m.tolist())
        return cache[key]

    for _ in range(subdiv):
        nf = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = nf
    return np.asarray(verts), np.asarray(faces, dtype=np.int64)


def torus_mesh(nu: int = 96, nv: int = 48, R: float = 1.0, r: float = 0.4):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = (R + r * np.cos(vv)) * np.sin(uu)
    z = r * np.sin(vv)
    verts = np.stack([x, y, z], -1).reshape(-1, 3)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [(a, b, c), (a, c, d)]
    return verts, np.asarray(faces, dtype=np.int64)


def uv_mesh(fxyz, nu: int, nv: int, wrap_u: bool = True,
            wrap_v: bool = False):
    """Generic UV-grid triangle mesh from a parametric surface.

    fxyz: (u, v arrays in [0,1]) -> [..., 3] vertices. `wrap_*` closes the
    seam on that axis (torus-like topology when both wrap).
    """
    u = np.linspace(0, 1, nu, endpoint=not wrap_u)
    v = np.linspace(0, 1, nv, endpoint=not wrap_v)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = fxyz(uu, vv).reshape(-1, 3)
    mu = nu if wrap_u else nu - 1
    mv = nv if wrap_v else nv - 1
    faces = []
    for i in range(mu):
        for j in range(mv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces += [(a, b, c), (a, c, d)]
    return verts, np.asarray(faces, dtype=np.int64)


def _spow(x, e):
    return np.sign(x) * np.abs(x) ** e


def superellipsoid(e1: float, e2: float, scales):
    """Superquadric surface (Barr 1981), poles slightly inset to keep the
    UV mesh non-degenerate."""
    sx, sy, sz = scales

    def f(uu, vv):
        th = (vv - 0.5) * np.pi * 0.98          # latitude, pole-inset
        ph = uu * 2 * np.pi                     # longitude (wraps)
        x = sx * _spow(np.cos(th), e1) * _spow(np.cos(ph), e2)
        y = sy * _spow(np.cos(th), e1) * _spow(np.sin(ph), e2)
        z = sz * _spow(np.sin(th), e1)
        return np.stack([x, y, z], -1)

    return uv_mesh(f, 80, 60, wrap_u=True, wrap_v=False)


def bumpy_sphere(amp: float, ku: int, kv: int):
    """Sphere with a deterministic radial modulation field."""

    def f(uu, vv):
        th = (vv - 0.5) * np.pi * 0.98
        ph = uu * 2 * np.pi
        r = 1.0 + amp * np.sin(ku * ph) * np.cos(kv * th)
        x = r * np.cos(th) * np.cos(ph)
        y = r * np.cos(th) * np.sin(ph)
        z = r * np.sin(th)
        return np.stack([x, y, z], -1)

    return uv_mesh(f, 96, 64, wrap_u=True, wrap_v=False)


def varied_torus(R: float, r: float, wobble: float = 0.0, k: int = 3):
    """Torus with optional tube-radius wobble along the ring."""

    def f(uu, vv):
        ph = uu * 2 * np.pi
        th = vv * 2 * np.pi
        rr = r * (1.0 + wobble * np.sin(k * ph))
        x = (R + rr * np.cos(th)) * np.cos(ph)
        y = (R + rr * np.cos(th)) * np.sin(ph)
        z = rr * np.sin(th)
        return np.stack([x, y, z], -1)

    return uv_mesh(f, 96, 48, wrap_u=True, wrap_v=True)


def fixture_shapes(n_shapes: int):
    """Deterministic shape zoo: the first two keep their round-1 names
    (sphere/torus fixture compatibility); the rest cycles three parametric
    families with varied parameters, protocol-scale (127 for the PU1K
    dress rehearsal, `evaluation/eval_pu1k.sh`'s 127 meshes)."""
    shapes = {"sphere": icosphere(4), "torus": torus_mesh()}
    i = 0
    while len(shapes) < n_shapes:
        fam = i % 3
        j = i // 3
        if fam == 0:
            e1 = 0.4 + 0.12 * (j % 7)
            e2 = 0.4 + 0.17 * (j // 7 % 7)
            sc = (1.0, 0.75 + 0.05 * (j % 5), 0.6 + 0.06 * (j % 6))
            shapes[f"superq_{j:03d}"] = superellipsoid(e1, e2, sc)
        elif fam == 1:
            amp = 0.05 + 0.02 * (j % 6)
            shapes[f"bumpy_{j:03d}"] = bumpy_sphere(amp, 2 + j % 5,
                                                    2 + j % 4)
        else:
            R = 1.0
            r = 0.25 + 0.05 * (j % 5)
            wob = 0.0 if j % 2 == 0 else 0.15
            shapes[f"torus_{j:03d}"] = varied_torus(R, r, wob, 2 + j % 4)
        i += 1
    return shapes


def sample_surface(rng, verts, faces, n):
    """Uniform area-weighted surface sampling."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    probs = areas / areas.sum()
    fi = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.rand(n))[:, None]
    r2 = rng.rand(n)[:, None]
    return ((1 - r1) * v0[fi] + r1 * (1 - r2) * v1[fi] + r1 * r2 * v2[fi])


def save_off(path, verts, faces):
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures"
    n_shapes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # protocol point counts: PU1K 2048 -> 8192 (default); pass 5000 20000
    # for the PU-GAN protocol shapes (reference evaluation/eval_pugan.sh)
    n_input = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    n_gt = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    for d in ("mesh", "gt", "input"):
        os.makedirs(os.path.join(out, d), exist_ok=True)
    rng = np.random.RandomState(0)
    shapes = fixture_shapes(n_shapes)
    for name, (verts, faces) in shapes.items():
        save_off(os.path.join(out, "mesh", f"{name}.off"), verts, faces)
        gt = sample_surface(rng, verts, faces, n_gt)
        inp = sample_surface(rng, verts, faces, n_input)
        np.savetxt(os.path.join(out, "gt", f"{name}.xyz"), gt, fmt="%.6f")
        np.savetxt(os.path.join(out, "input", f"{name}.xyz"), inp,
                   fmt="%.6f")
    names = list(shapes)
    shown = names if len(names) <= 6 else names[:3] + ["..."] + names[-2:]
    print(f"fixtures written to {out}: {len(names)} shapes ({shown})")


if __name__ == "__main__":
    main()
