package graft.operators

/** Shared DuckDB-oracle SQL builders.
  *
  * [[closureCtes]] replaces the original `WITH RECURSIVE reach(id, comp)`
  * transitive-closure oracles: that formulation accumulates one row per
  * (node, reachable-ancestor) pair, which is quadratic in cluster size —
  * measured 176 s for the q69 oracle alone at sf0.01, and unbounded on a
  * few-hundred-node chain (a 300-node path did not finish in 6 minutes).
  * The driver's correctness gate runs every oracle in one budgeted pass,
  * so a single pathological oracle can blank the round's whole artifact
  * (the round-11 `CORRECTNESS_r11.json = {}` failure).
  *
  * The replacement is an ITERATION-UNROLLED min-label propagation with
  * pointer jumping (the q133 loop-oracle precedent: each round is its own
  * CTE block), converging to the same fixpoint:
  *
  *  - `l0(v) = v` over the nodes of the symmetric edge set;
  *  - propagate: `m_k(v) = min(l_{k-1}(v), min over neighbors u of
  *    l_{k-1}(u))`;
  *  - jump: `l_k(v) = m_k(m_k(v))` (labels are node ids, so the jump is
  *    an id-keyed self-join).
  *
  * Labels are pointwise non-increasing and always ids of nodes in v's own
  * component, so at any fixpoint the label is constant per component and
  * equals the component min — the recursive formulation's exact output.
  * Convergence within the unrolled rounds is NOT assumed: a final
  * propagation round certifies the fixpoint, and any remaining
  * improvement raises `error(...)` through DuckDB, failing the gate
  * loudly instead of silently producing under-merged clusters. (With
  * jumping, effective reach at round k exceeds 2^k hops; rounds = 8
  * covers any plausible near-dup chain — the extra rounds beyond the
  * original 6 cost only a few joins over the already-materialized tiny
  * label frames, and mean a denser future fixture converges instead of
  * blanking the round's gate the way the recursive-CTE timeout did —
  * and the certificate catches the implausible ones.)
  *
  * Every multiply-referenced CTE is MATERIALIZED: DuckDB inlines CTE
  * references by default, which re-evaluates the producer per reference —
  * exponentially so through this chain (each round references the
  * previous one twice), and measurably so for any upstream CTE with an
  * expensive projection.
  */
private[graft] object OracleSql {

  /** CTE chain `<prefix>edges, <prefix>l0, ..., <prefix>clus` closing the
    * symmetric graph over `pairs(id1, id2)` to connected components.
    * `<prefix>clus(id, comp)` has one row per node appearing in any pair,
    * `comp` = min node id of its component, BIGINT. Splice after the
    * pair-emitting CTEs (plain `WITH` — no RECURSIVE keyword needed). */
  def closureCtes(pairs: String, prefix: String = "", rounds: Int = 8): String = {
    val p = prefix
    val head = Seq(
      s"${p}edges AS MATERIALIZED (SELECT id1 AS src, id2 AS dst FROM $pairs" +
        s" UNION SELECT id2, id1 FROM $pairs)",
      s"${p}l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM ${p}edges)")
    val loops = (1 to rounds).flatMap { k =>
      Seq(
        s"${p}s$k AS (SELECT e.dst AS id, min(l.comp) AS comp" +
          s" FROM ${p}l${k - 1} l JOIN ${p}edges e ON e.src = l.id GROUP BY e.dst)",
        s"${p}m$k AS MATERIALIZED (SELECT l.id, least(l.comp, coalesce(s.comp, l.comp)) AS comp" +
          s" FROM ${p}l${k - 1} l LEFT JOIN ${p}s$k s USING (id))",
        s"${p}l$k AS MATERIALIZED (SELECT a.id, b.comp" +
          s" FROM ${p}m$k a JOIN ${p}m$k b ON a.comp = b.id)")
    }
    val tail = Seq(
      s"${p}sx AS (SELECT e.dst AS id, min(l.comp) AS comp" +
        s" FROM ${p}l$rounds l JOIN ${p}edges e ON e.src = l.id GROUP BY e.dst)",
      s"${p}chk AS (SELECT count(*) AS bad FROM ${p}l$rounds l" +
        s" JOIN ${p}sx s USING (id) WHERE s.comp < l.comp)",
      s"${p}clus AS (SELECT id, CASE WHEN (SELECT bad FROM ${p}chk) > 0" +
        s" THEN error('closure not converged after $rounds rounds')" +
        s" ELSE comp END::BIGINT AS comp FROM ${p}l$rounds)")
    (head ++ loops ++ tail).mkString(",\n")
  }
}
