package graft.forecast

/** DuckDB replay of the Hannan–Rissanen ARIMA fit ([[Models.arimaFit]]):
  * d-fold differencing, the stage-1 long-AR OLS (q > 0), stage-1
  * residuals, the stage-2 OLS on [1, p w-lags, q resid-lags], the
  * innovations recursion, and the 1-step forecast with d-integration —
  * every double op in the exact order of the Scala code, so the replay is
  * bit-exact (verified per-config during development).
  *
  * The two OLS solves replay [[Models.olsSolve]] literally: normal
  * equations accumulated row-ascending, then Gaussian elimination with
  * partial pivoting — per column: strict-max pivot scan (first max wins,
  * like the Scala `>`), row swap, elimination of every other row on
  * columns ≥ col, 1e-10 singularity flag. A flagged system drops its unit
  * from `hrfit`, matching arimaFit's None.
  *
  * FORMULATION CONSTRAINT (learned the hard way): DuckDB 1.0 evaluates
  * NESTED list comprehensions ([[…] for …]) with float arithmetic in a
  * row-order-sensitive way — the same matrix solved in a differently-
  * ordered batch drifts at ~1e-11, which breaks a hash oracle. So the
  * elimination state lives in SCALAR ROWS (ukey, ri, ci, v) with the k
  * passes UNROLLED as materialized CTE chains (window-function pivoting,
  * join-based elimination), and the innovations recursion carries scalar
  * lag columns (q ≤ 4) instead of a growing list. Single-level
  * comprehensions / list_reduce folds (the long-stable m_arma_wf pattern)
  * are kept; only the nested shape is banned. MATERIALIZED is load-
  * bearing twice over: it pins evaluation boundaries AND prevents
  * exponential inlining of the pass chain (each pass references its
  * predecessor four times).
  *
  * SQL-side indices are 1-based (DuckDB lists); comments keep the Scala
  * 0-based names, e.g. w(t−1−j) == w[t−j].
  *
  * Input contract: a CTE `units(ukey VARCHAR, p INT, d INT, q INT,
  * xs DOUBLE[])` with p, q ≤ 4 and d ∈ {0, 1} (the reference grid's
  * ranges). Output: CTE `hrfit(ukey, c, s2, forecast)` — failed units are
  * simply absent.
  */
private[forecast] object HrReplay {

  /** Ordered multiply-add chain `base + l[1]*x1 + … + l[arity]*xarity`
    * in the exact Scala fold order, selected by runtime arity ∈ [0, 4]:
    * CASE arity WHEN 2 THEN (base + l[1]*x1) + l[2]*x2 … END.
    * `xs(j)` supplies the j-th (1-based) multiplicand expression.
    */
  private def maChain(arity: String, base: String, l: String, x: Int => String): String = {
    val arms = (0 to 4).map { a =>
      val sum = (1 to a).foldLeft(base)((acc, j) => s"($acc + $l[$j] * ${x(j)})")
      s"WHEN $a THEN $sum"
    }
    s"(CASE $arity ${arms.mkString(" ")} END)"
  }

  /** One scalar Gaussian-elimination pass at column `s` over entry rows
    * `${pfx}e$s(ukey, kk, ri, ci, v, failed)` → `${pfx}e${s+1}`.
    * Finished (s ≥ kk) and failed systems pass through frozen.
    */
  private def gePass(pfx: String, s: Int): String =
    s"""${pfx}p$s AS MATERIALIZED (
       |  SELECT ukey, ri AS piv FROM (
       |    SELECT ukey, ri, row_number() OVER (PARTITION BY ukey ORDER BY abs(v) DESC, ri) AS rn
       |    FROM ${pfx}e$s WHERE ci = $s AND ri >= $s AND $s < kk AND NOT failed) t
       |  WHERE rn = 1),
       |${pfx}w$s AS MATERIALIZED (
       |  SELECT e.ukey, e.kk, e.v,
       |    CASE WHEN e.ri = $s THEN p.piv WHEN e.ri = p.piv THEN $s ELSE e.ri END AS ri,
       |    e.ci
       |  FROM ${pfx}e$s e JOIN ${pfx}p$s p USING (ukey)
       |  WHERE NOT e.failed AND $s < e.kk),
       |${pfx}f$s AS MATERIALIZED (
       |  SELECT w.ukey, abs(w.v) < 1e-10 AS nf
       |  FROM ${pfx}w$s w WHERE w.ri = $s AND w.ci = $s),
       |${pfx}e${s + 1} AS MATERIALIZED (
       |  SELECT ukey, kk, ri, ci, v, failed FROM ${pfx}e$s WHERE failed OR $s >= kk
       |  UNION ALL
       |  SELECT w.ukey, w.kk, w.ri, w.ci,
       |    CASE WHEN f.nf OR w.ri = $s OR w.ci < $s THEN w.v
       |         ELSE w.v - (fr.fv / dv.dv) * pr.pv END AS v,
       |    f.nf AS failed
       |  FROM ${pfx}w$s w
       |  JOIN ${pfx}f$s f USING (ukey)
       |  JOIN (SELECT ukey, v AS dv FROM ${pfx}w$s WHERE ri = $s AND ci = $s) dv USING (ukey)
       |  JOIN (SELECT ukey, ri, v AS fv FROM ${pfx}w$s WHERE ci = $s) fr
       |    ON w.ukey = fr.ukey AND w.ri = fr.ri
       |  JOIN (SELECT ukey, ci, v AS pv FROM ${pfx}w$s WHERE ri = $s) pr
       |    ON w.ukey = pr.ukey AND w.ci = pr.ci)""".stripMargin

  /** Unrolled GE chain: `${pfx}e0` → … → `${pfx}b(ukey, b)` with b the
    * ri-ordered solution list; failed/short systems have no row.
    */
  private def geChain(pfx: String, passes: Int): String = {
    val chain = (0 until passes).map(gePass(pfx, _)).mkString(",\n")
    s"""$chain,
       |${pfx}b AS MATERIALIZED (
       |  SELECT d.ukey, list(n.v / d.v ORDER BY d.ri) AS b
       |  FROM (SELECT ukey, ri, v FROM ${pfx}e$passes WHERE ri = ci AND NOT failed) d
       |  JOIN (SELECT ukey, ri, v FROM ${pfx}e$passes WHERE ci = kk AND NOT failed) n
       |    ON d.ukey = n.ukey AND d.ri = n.ri
       |  GROUP BY d.ukey)""".stripMargin
  }

  /** The fit chain, `units` → `hrfit`.
    *
    * @param s1Passes GE passes for the stage-1 long-AR solve — must be
    *                 ≥ max m+1 = min(max(p+q+2,4), n/4) + 1 over the units
    * @param s2Passes GE passes for the stage-2 solve — must be ≥ max p+q+1
    */
  def chain(s1Passes: Int, s2Passes: Int): String =
    s"""hsized AS MATERIALIZED (
       |  SELECT ukey, p, d, q, xs,
       |    CASE WHEN d = 0 THEN xs ELSE [ xs[j+1] - xs[j] for j in range(1, len(xs)) ] END AS w
       |  FROM units
       |  WHERE len(xs) >= d + greatest(p, q) + 5),
       |hszd AS MATERIALIZED (
       |  SELECT *, len(w) AS n, greatest(p, q) AS mpq,
       |    CASE WHEN q > 0 THEN least(greatest(p + q + 2, 4), greatest(1, len(w) // 4)) ELSE 0 END AS m
       |  FROM hsized),
       |hidx AS (SELECT CAST(ii.range AS INT) AS ix FROM range(0, ${s1Passes + 2}) ii),
       |hs1 AS MATERIALIZED (
       |  SELECT ukey, w, n, m, m + 1 AS kk FROM hszd WHERE q > 0 AND n > m + p + q + 1),
       |hae0 AS MATERIALIZED (
       |  SELECT s.ukey, s.kk, i.ix AS ri, j.ix AS ci,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      [ (CASE WHEN i.ix = 0 THEN 1.0 ELSE s.w[t - i.ix + 1] END) *
       |        (CASE WHEN j.ix = s.kk THEN s.w[t + 1]
       |              WHEN j.ix = 0 THEN 1.0 ELSE s.w[t - j.ix + 1] END)
       |        for t in range(s.m, s.n) ]), (acc, v) -> acc + v) AS v,
       |    FALSE AS failed
       |  FROM hs1 s JOIN hidx i ON i.ix < s.kk JOIN hidx j ON j.ix < s.kk + 1),
       |${geChain("ha", s1Passes)},
       |hres0 AS MATERIALIZED (
       |  SELECT ukey, unnest(range(0, n)) AS tb
       |  FROM (SELECT s.ukey, s.n FROM hs1 s JOIN hab b USING (ukey)) z),
       |hrest AS MATERIALIZED (
       |  SELECT r.ukey, CAST(r.tb AS INT) AS t,
       |    CASE WHEN r.tb < s.m THEN CAST(0 AS DOUBLE)
       |         ELSE s.w[r.tb + 1] - list_reduce(list_prepend(b.b[1],
       |           [ b.b[j + 1] * s.w[r.tb - j + 1] for j in range(1, s.m + 1) ]),
       |           (acc, v) -> acc + v)
       |    END AS rv
       |  FROM hres0 r JOIN hs1 s USING (ukey) JOIN hab b USING (ukey)),
       |hres AS MATERIALIZED (SELECT ukey, list(rv ORDER BY t) AS res FROM hrest GROUP BY ukey),
       |hs2 AS MATERIALIZED (
       |  SELECT z.ukey, z.p, z.d, z.q, z.xs, z.w, z.n, z.mpq,
       |    z.mpq + (CASE WHEN z.q > 0 THEN z.m ELSE 0 END) AS st,
       |    z.p + z.q + 1 AS kk,
       |    CASE WHEN z.q > 0 THEN r.res ELSE NULL END AS res
       |  FROM hszd z LEFT JOIN hres r USING (ukey)
       |  WHERE NOT (z.p = 0 AND z.q = 0)
       |    AND (z.q = 0 OR r.ukey IS NOT NULL)
       |    AND z.n - (z.mpq + (CASE WHEN z.q > 0 THEN z.m ELSE 0 END)) >= z.p + z.q + 2),
       |hbe0 AS MATERIALIZED (
       |  SELECT s.ukey, s.kk, i.ix AS ri, j.ix AS ci,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      [ (CASE WHEN i.ix = 0 THEN 1.0
       |              WHEN i.ix <= s.p THEN s.w[t - i.ix + 1]
       |              ELSE s.res[t - (i.ix - s.p) + 1] END) *
       |        (CASE WHEN j.ix = s.kk THEN s.w[t + 1]
       |              WHEN j.ix = 0 THEN 1.0
       |              WHEN j.ix <= s.p THEN s.w[t - j.ix + 1]
       |              ELSE s.res[t - (j.ix - s.p) + 1] END)
       |        for t in range(s.st, s.n) ]), (acc, v) -> acc + v) AS v,
       |    FALSE AS failed
       |  FROM hs2 s JOIN hidx i ON i.ix < s.kk JOIN hidx j ON j.ix < s.kk + 1),
       |${geChain("hb", s2Passes)},
       |hcoef AS MATERIALIZED (
       |  SELECT s.ukey, s.p, s.d, s.q, s.xs, s.w, s.n, s.mpq,
       |    b.b[1] AS c, b.b[2 : s.p + 1] AS phi, b.b[s.p + 2 : s.p + s.q + 1] AS theta
       |  FROM hs2 s JOIN hbb b USING (ukey)),
       |heps AS (
       |  SELECT ukey, p, q, n, mpq, w, c, phi, theta, mpq AS t,
       |    CAST(0 AS DOUBLE) AS e1, CAST(0 AS DOUBLE) AS e2,
       |    CAST(0 AS DOUBLE) AS e3, CAST(0 AS DOUBLE) AS e4,
       |    CAST(0 AS DOUBLE) AS sse
       |  FROM hcoef
       |  UNION ALL
       |  SELECT ukey, p, q, n, mpq, w, c, phi, theta, t + 1,
       |    en, e1, e2, e3, sse + en * en
       |  FROM (
       |    SELECT *, w[t + 1] - ${maChain("q", "fp", "theta", j => s"e$j")} AS en
       |    FROM (
       |      SELECT *, ${maChain("p", "c", "phi", j => s"w[t - ${j - 1}]")} AS fp
       |      FROM heps WHERE t < n) t1) t2),
       |hfin AS MATERIALIZED (
       |  SELECT ukey, p, q, n, mpq, w, c, phi, theta, e1, e2, e3, e4,
       |    sse / (n - mpq) AS s2
       |  FROM heps WHERE t = n),
       |hfcm AS MATERIALIZED (
       |  SELECT f.ukey, f.c, f.s2,
       |    CASE WHEN s.d = 1 THEN fnext + s.xs[len(s.xs)] ELSE fnext END AS forecast
       |  FROM (
       |    SELECT *, ${maChain("q", "fp", "theta", j => s"e$j")} AS fnext
       |    FROM (
       |      SELECT *, ${maChain("p", "c", "phi", j => s"w[n - ${j - 1}]")} AS fp
       |      FROM hfin) t1) f
       |  JOIN hs2 s USING (ukey)),
       |hpq0 AS MATERIALIZED (
       |  SELECT ukey, d, xs, w, n,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), w), (acc, v) -> acc + v) / n AS c
       |  FROM hszd WHERE p = 0 AND q = 0),
       |hpq0f AS MATERIALIZED (
       |  SELECT ukey, c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      [ (v - c) * (v - c) for v in w ]), (acc, v) -> acc + v) / greatest(1, n - 1) AS s2,
       |    CASE WHEN d = 1 THEN c + xs[len(xs)] ELSE c END AS forecast
       |  FROM hpq0),
       |hrfit AS (
       |  SELECT ukey, c, s2, forecast FROM hfcm
       |  UNION ALL
       |  SELECT ukey, c, s2, forecast FROM hpq0f)""".stripMargin
}
