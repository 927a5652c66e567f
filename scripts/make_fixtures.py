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
    for d in ("mesh", "gt", "input"):
        os.makedirs(os.path.join(out, d), exist_ok=True)
    rng = np.random.RandomState(0)
    shapes = {"sphere": icosphere(4), "torus": torus_mesh()}
    for name, (verts, faces) in shapes.items():
        save_off(os.path.join(out, "mesh", f"{name}.off"), verts, faces)
        gt = sample_surface(rng, verts, faces, 8192)
        inp = sample_surface(rng, verts, faces, 2048)
        np.savetxt(os.path.join(out, "gt", f"{name}.xyz"), gt, fmt="%.6f")
        np.savetxt(os.path.join(out, "input", f"{name}.xyz"), inp,
                   fmt="%.6f")
    print(f"fixtures written to {out}: {list(shapes)}")


if __name__ == "__main__":
    main()
