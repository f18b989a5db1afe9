"""Deterministic benchmark instance suite.

Netlib/Mittelmann files are not vendored in this image, so the suite is a
spread of synthetic planted-feasible LPs (tpdlp.io.generator, the
reference's own fixture generator style: Packages/generate_feasible_lp.py)
covering the size/density range of the classic sets: afiro-class tiny LPs
up to Mittelmann-class large sparse instances.
"""

from __future__ import annotations

from tpdlp.io.generator import generate_feasible_lp

# name, n, m_ineq, m_eq, density
SMALL = [
    ("afiro-class", 51, 17, 10, 0.30),
    ("sc50-class", 78, 30, 18, 0.20),
    ("share-class", 225, 90, 27, 0.15),
]
MEDIUM = [
    ("deg2-class", 757, 280, 164, 0.05),
    ("bnl-class", 1586, 500, 132, 0.02),
    ("maros-class", 2000, 600, 246, 0.02),
]
LARGE = [
    ("mittelmann-s", 5000, 1500, 500, 0.01),
    ("mittelmann-m", 10000, 3000, 1000, 0.004),
]
XL = [
    # zib03-direction: ~0.6 GB dense fp32 constraint matrix.
    ("mittelmann-l", 20000, 6000, 2000, 0.002),
]


def build_suite(classes=("small", "medium")):
    spec = []
    if "small" in classes:
        spec += SMALL
    if "medium" in classes:
        spec += MEDIUM
    if "large" in classes:
        spec += LARGE
    if "xl" in classes:
        spec += XL
    problems = []
    for name, n, mi, me, d in spec:
        p = generate_feasible_lp(n=n, m_ineq=mi, m_eq=me, density=d, seed=7)
        p.name = name
        problems.append(p)
    return problems
