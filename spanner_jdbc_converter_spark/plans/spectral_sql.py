"""Spectral oracle fragments shared across corpus modules: the unrolled
power-iteration (PC1) and deflated-second-component (PCA2) CTE chains
that replay operators/clustering.py::power_iteration_pc1 / pca2_coords
bit-for-bit (fold orders, DECIMAL ladders, the 1/8 seed).

Extracted from plans/mining.py in r17 so plans/etl.py (which loads
BEFORE mining in the registry order) can compose the same chains into
the OPQ-lite rotation oracle without an import cycle or a registration
reorder.  No @register calls live here — importing this module is
side-effect-free.
"""

from __future__ import annotations


def _pc1_ctes(iters: int = 3, dim: int = 64) -> tuple[str, str, str]:
    """Unrolled power-iteration CTE clauses (the k-means/perceptron
    discipline applied to a matvec recurrence).  Returns (clauses,
    final_v_cte, rayleigh_cte); `v{it}` frames hold the normalized
    direction list after round it, `ray` the last round's Rayleigh
    quotient."""
    rng = f"range(1, {dim + 1})"
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS x FROM embeddings)",
        f"""st AS (
      SELECT pos, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
               AS mu,
             COUNT(*) AS n
      FROM (SELECT unnest(range(0, {dim})) AS pos, unnest(x) AS v FROM e)
      GROUP BY pos)""",
        "ml AS (SELECT list(mu ORDER BY pos) AS mu, MAX(n) AS n FROM st)",
        f"v0 AS (SELECT list_transform({rng}, d -> CAST(0.125 AS DOUBLE)) AS v"
        " FROM ml)",
    ]
    for it in range(1, iters + 1):
        prev = f"v{it - 1}"
        parts.append(
            f"""w{it} AS (
      SELECT pos, CAST(SUM(CAST(t AS DECIMAL(28,12))) AS DOUBLE) AS w
      FROM (
        SELECT unnest(range(0, {dim})) AS pos,
               unnest(list_transform({rng},
                      d -> (s / n) * (x[d] - mu[d]))) AS t
        FROM (
          SELECT e.x, m.mu, m.n,
                 list_reduce(list_transform({rng}, d -> e.x[d] * vv.v[d]),
                             (a, b) -> a + b)
                 - list_reduce(list_transform({rng}, d -> m.mu[d] * vv.v[d]),
                               (a, b) -> a + b) AS s
          FROM e, ml m, {prev} vv
        )
      ) GROUP BY pos)"""
        )
        parts.append(
            f"wl{it} AS (SELECT list(w ORDER BY pos) AS wl FROM w{it})"
        )
        parts.append(
            f"""v{it} AS (
      SELECT CASE WHEN nrm = 0.0 THEN list_transform(wl, q -> CAST(0.0 AS DOUBLE))
                  ELSE list_transform(wl, q -> q / nrm) END AS v
      FROM (SELECT wl,
                   sqrt(list_reduce(list_transform(wl, q -> q * q),
                                    (a, b) -> a + b)) AS nrm
            FROM wl{it}))"""
        )
    parts.append(
        f"""ray AS (
      SELECT list_reduce(list_transform({rng}, d -> pv.v[d] * wl[d]),
                         (a, b) -> a + b) AS eig
      FROM v{iters - 1} pv, wl{iters})"""
    )
    return ",\n    ".join(parts), f"v{iters}", "ray"


def _pca2_ctes(iters: int = 3, dim: int = 64) -> tuple[str, str, str, str]:
    """PC1 chain + the DEFLATED second chain (u{it} frames power-iterate
    against X' = Xc(I − v1·v1ᵀ)): returns (clauses, v1_cte, u_cte,
    ray2_cte).  Fold orders mirror clustering._pi_rounds exactly —
    s = ((x·u − μ·u) − p1·(v1·u)) / n, update term
    (x_d − μ_d) − p1·v1_d."""
    rng = f"range(1, {dim + 1})"
    base, v1cte, raycte = _pc1_ctes(iters, dim)
    parts = [base]

    def fold(a, b):
        return (
            f"list_reduce(list_transform({rng}, d -> {a}[d] * {b}[d]),"
            " (a, b) -> a + b)"
        )

    prev = "v0"
    for it in range(1, iters + 1):
        parts.append(
            f"""dw{it} AS (
      SELECT pos, CAST(SUM(CAST(t AS DECIMAL(28,12))) AS DOUBLE) AS w
      FROM (
        SELECT unnest(range(0, {dim})) AS pos,
               unnest(list_transform({rng},
                      d -> (s / n) * ((x[d] - mu[d]) - p1 * w1[d]))) AS t
        FROM (
          SELECT e.x, m.mu, m.n, vf.v AS w1,
                 ({fold("e.x", "uu.v")} - {fold("m.mu", "uu.v")})
                 - ({fold("e.x", "vf.v")} - {fold("m.mu", "vf.v")})
                   * {fold("vf.v", "uu.v")} AS s,
                 {fold("e.x", "vf.v")} - {fold("m.mu", "vf.v")} AS p1
          FROM e, ml m, {v1cte} vf, {prev} uu
        )
      ) GROUP BY pos)"""
        )
        parts.append(
            f"dwl{it} AS (SELECT list(w ORDER BY pos) AS wl FROM dw{it})"
        )
        parts.append(
            f"""u{it} AS (
      SELECT CASE WHEN nrm = 0.0 THEN list_transform(wl, q -> CAST(0.0 AS DOUBLE))
                  ELSE list_transform(wl, q -> q / nrm) END AS v
      FROM (SELECT wl,
                   sqrt(list_reduce(list_transform(wl, q -> q * q),
                                    (a, b) -> a + b)) AS nrm
            FROM dwl{it}))"""
        )
        prev = f"u{it}"
    upen = f"u{iters - 1}" if iters > 1 else "v0"
    parts.append(
        f"""ray2 AS (
      SELECT list_reduce(list_transform({rng}, d -> pu.v[d] * wl[d]),
                         (a, b) -> a + b) AS eig
      FROM {upen} pu, dwl{iters})"""
    )
    return ",\n    ".join(parts), v1cte, f"u{iters}", "ray2"


def _fold64_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, 65), d -> {a}[d] * {b}[d]),"
        " (a, b) -> a + b)"
    )
