package graft

import graft.operators.{Dedup, Similarity}

/** DuckDB oracle SQL for the LLM-pipeline operators (dedup / similarity /
  * text / multimodal). Pseudo-random constants (minhash perms, LSH planes)
  * are generated from the SAME md5-derived values the Spark operators use
  * (graft.functions.Hashing.h60jvm), so both engines see identical literals.
  */
object PipelineOracles {

  /** DuckDB twin of Hashing.h60. */
  private def h60(x: String) = s"('0x' || substr(md5($x), 1, 15))::UBIGINT"

  /** Fixed-unroll replay of TextAnalysis.bpeMerges: k trainer rounds,
    * same double-space symbol representation, same greedy left-to-right
    * `replace` merge apply (both engines' replace scans sequentially
    * non-overlapping), same (occ DESC, a, b) argmax tie-break.
    */
  private def bpeMergesOracle(k: Int): String = {
    // MATERIALIZED is load-bearing: each v_r is consumed by BOTH p_{r+1}
    // and v_{r+1}, so inlining re-derives the whole chain per consumer
    // (measured 9.8 s vs 0.46 s at sf0.1) — the Spark side checkpoints
    // per round, so the twin must get the same linear evaluation
    val rounds = (1 to k).map { r =>
      s"""p$r AS MATERIALIZED (SELECT sy[i] AS a, sy[i + 1] AS b, cnt
           FROM (SELECT cnt, sy, unnest(generate_series(1, len(sy) - 1)) AS i
                 FROM (SELECT cnt, string_split(trim(syms), '  ') AS sy FROM v${r - 1})
                 WHERE len(sy) >= 2)),
         b$r AS MATERIALIZED (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS occ FROM p$r
                 GROUP BY 1, 2 ORDER BY occ DESC, a, b LIMIT 1),
         v$r AS MATERIALIZED (SELECT replace(v.syms, ' ' || b.a || '  ' || b.b || ' ',
                                ' ' || b.a || b.b || ' ') AS syms, v.cnt
                 FROM v${r - 1} v CROSS JOIN b$r b)"""
    }.mkString(",\n         ")
    val rows = (1 to k).map(r =>
      s"""SELECT $r AS merge_round, a AS sym_a, b AS sym_b,
              a || b AS merged, occ AS occurrences FROM b$r""")
      .mkString(" UNION ALL ")
    s"""WITH $tok,
         tkx AS (SELECT unnest(tk) AS tok2 FROM tok),
         v0 AS MATERIALIZED (SELECT
                       ' ' || rtrim(regexp_replace(tok2, '(.)', '\\1  ', 'g')) || ' ' AS syms,
                       count(*) AS cnt
                FROM tkx WHERE length(tok2) >= 2 GROUP BY 1),
         $rounds
         SELECT * FROM ($rows) ORDER BY merge_round"""
  }

  /** Replay of TextAnalysis.bpeEncodeStats: train the same k merges
    * (bpeMergesOracle's CTE chain), then apply them IN LEARNED ORDER as
    * nested greedy replaces over every corpus token and aggregate
    * per-source fertility. Merge application is NULL-SAFE (r14 advice):
    * if the corpus exhausts learnable merges before round k, the empty
    * b_r rows arrive as NULLs through LEFT JOINs and coalesce to a
    * never-matching chr(1) pattern — a no-op replace, exactly like the
    * Spark side applying only the merges actually learned (a CROSS JOIN
    * would instead empty `enc` and return zero rows).
    */
  private def bpeEncodeOracle(k: Int): String = {
    val trainer = bpeMergesOracle(k)
    val ctes = trainer.substring(trainer.indexOf("WITH ") + 5,
      trainer.lastIndexOf("SELECT * FROM"))
    // nested replaces, merge 1 innermost (applied first)
    val applied = (1 to k).foldLeft(
      "' ' || rtrim(regexp_replace(d.tok2, '(.)', '\\1  ', 'g')) || ' '") {
      (inner, r) =>
        s"""replace($inner, coalesce(' ' || b$r.a || '  ' || b$r.b || ' ', chr(1)),
                    coalesce(' ' || b$r.a || b$r.b || ' ', chr(1)))"""
    }
    val joins = (1 to k).map(r => s"LEFT JOIN b$r ON TRUE").mkString(" ")
    s"""WITH $ctes,
         dtk AS (SELECT d2.source, t.doc_id, unnest(t.tk) AS tok2
                 FROM tok t JOIN documents d2 USING (doc_id)),
         enc AS (SELECT d.source, d.doc_id,
                        len(string_split(trim($applied), '  ')) AS nsub
                 FROM (SELECT * FROM dtk WHERE length(tok2) >= 1) d $joins)
         SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                count(*) AS n_words, CAST(sum(nsub) AS BIGINT) AS n_subtokens,
                floor((sum(nsub) * 1.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS fertility
         FROM enc GROUP BY 1"""
  }

  /** One PCA power-iteration round (Similarity.pcaPower replay): snap →
    * center → dot (1e-9 grid) → weighted per-dim sum (1e-6 grid) →
    * driver-order norm fold. Shared by the loading report and the
    * projection histogram.
    */
  private val pcaCtes: String = """
         flat AS (SELECT vec_id, i.pos AS dim,
                         CAST(floor(embedding[i.pos]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS g
                  FROM embeddings
                  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         mn AS (SELECT dim, sum(g) AS sg, count(*) AS n FROM flat GROUP BY 1),
         ctr AS (SELECT vec_id, f.dim, f.g / 1000000.0 - sg / (n * 1000000.0) AS cv, n
                 FROM flat f JOIN mn USING (dim)),
         d AS (SELECT vec_id,
                      sum(CAST(floor(cv * 0.125 * 1000000000.0 + 0.5) AS BIGINT)) AS dq
               FROM ctr GROUP BY 1),
         u AS (SELECT dim,
                      sum(CAST(floor(ctr.cv * (d.dq / 1000000000.0) * 1000000.0 + 0.5) AS BIGINT)) AS ss,
                      max(ctr.n) AS n
               FROM ctr JOIN d USING (vec_id) GROUP BY 1),
         uv AS (SELECT dim, ss / (n * 1000000.0) AS u FROM u),
         nr AS (SELECT sqrt(list_reduce(list_transform(list(u ORDER BY dim), x -> x * x),
                                        (a, b) -> a + b)) AS nrm FROM uv)"""

  private val tok =
    """tok AS (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS tk FROM documents)"""

  private val sh =
    s"""sh AS (SELECT doc_id, CAST(${h60("sg")} AS BIGINT) AS shingle
         FROM (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(tk) >= 3
                THEN list_transform(generate_series(1, len(tk)-2),
                                    i -> array_to_string(tk[i:i+2], ' '))
                ELSE []::VARCHAR[] END)) AS sg FROM tok))"""

  private val jaccardTail =
    """sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)"""

  private val dot64 = (a: String, b: String) =>
    s"list_sum(list_transform(generate_series(1, 64), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  private val nrm =
    s"""nrm AS (SELECT vec_id, sqrt(${dot64("embedding", "embedding")}) AS nrm FROM embeddings)"""

  /** Product-quantization CTE chain (codebooks, ADC scoring, ranked
    * candidates as `rk`) — shared by the pq top-k oracle and its
    * recall@k evaluation.
    */
  private val pqCtes: String = s"""sd AS (SELECT vec_id, embedding,
                ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::UBIGINT AS hv
                FROM embeddings),
         seeds AS (SELECT vec_id, embedding,
                   row_number() OVER (ORDER BY hv, vec_id) AS cid
                   FROM sd QUALIFY cid <= 8),
         ss AS (SELECT unnest(generate_series(0, 3)) AS s),
         cb AS (SELECT ss.s, seeds.cid,
                       list_slice(embedding, ss.s*16+1, ss.s*16+16) AS cvec
                FROM seeds CROSS JOIN ss),
         cbn AS (SELECT s, cid, cvec,
                 list_sum(list_transform(generate_series(1,16), i -> cvec[i]::DOUBLE * cvec[i]::DOUBLE)) AS cc
                 FROM cb),
         subv AS (SELECT e.vec_id, ss.s,
                         list_slice(e.embedding, ss.s*16+1, ss.s*16+16) AS sv
                  FROM embeddings e CROSS JOIN ss),
         subn AS (SELECT vec_id, s, sv,
                  list_sum(list_transform(generate_series(1,16), i -> sv[i]::DOUBLE * sv[i]::DOUBLE)) AS vv
                  FROM subv),
         enc AS (SELECT vec_id, s, cid, cc,
                 row_number() OVER (PARTITION BY vec_id, s ORDER BY
                   vv + cc - 2.0 * list_sum(list_transform(generate_series(1,16), i -> sv[i]::DOUBLE * cvec[i]::DOUBLE)) ASC, cid) AS r
                 FROM subn JOIN cbn USING (s)),
         codes AS (SELECT vec_id, s, cid, cc FROM enc WHERE r = 1),
         wide AS (SELECT vec_id,
                   max(CASE WHEN s = 0 THEN cid END) AS c0, max(CASE WHEN s = 0 THEN cc END) AS cc0,
                   max(CASE WHEN s = 1 THEN cid END) AS c1, max(CASE WHEN s = 1 THEN cc END) AS cc1,
                   max(CASE WHEN s = 2 THEN cid END) AS c2, max(CASE WHEN s = 2 THEN cc END) AS cc2,
                   max(CASE WHEN s = 3 THEN cid END) AS c3, max(CASE WHEN s = 3 THEN cc END) AS cc3
                  FROM codes GROUP BY 1),
         widen AS (SELECT *, sqrt(cc0 + cc1 + cc2 + cc3) AS rnrm FROM wide),
         q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, n.nrm AS qnrm
               FROM embeddings e JOIN nrm n USING (vec_id) WHERE e.vec_id < 10),
         qsub AS (SELECT query_id, ss.s, list_slice(qv, ss.s*16+1, ss.s*16+16) AS qs
                  FROM q CROSS JOIN ss),
         adc AS (SELECT query_id, s, cid,
                 list_sum(list_transform(generate_series(1,16), i -> qs[i]::DOUBLE * cvec[i]::DOUBLE)) AS qc
                 FROM qsub JOIN cbn USING (s)),
         pairs AS (SELECT qq.query_id, w.vec_id, qq.qnrm, w.rnrm,
                          a0.qc AS qc0, a1.qc AS qc1, a2.qc AS qc2, a3.qc AS qc3
                   FROM widen w CROSS JOIN q qq
                   JOIN adc a0 ON a0.query_id = qq.query_id AND a0.s = 0 AND a0.cid = w.c0
                   JOIN adc a1 ON a1.query_id = qq.query_id AND a1.s = 1 AND a1.cid = w.c1
                   JOIN adc a2 ON a2.query_id = qq.query_id AND a2.s = 2 AND a2.cid = w.c2
                   JOIN adc a3 ON a3.query_id = qq.query_id AND a3.s = 3 AND a3.cid = w.c3
                   WHERE w.vec_id <> qq.query_id),
         sc AS (SELECT query_id, vec_id, (qc0 + qc1 + qc2 + qc3) / (qnrm * rnrm) AS cos FROM pairs),
         rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk FROM sc)"""

  private val dot16 = (a: String, b: String) =>
    s"list_sum(list_transform(generate_series(1, 16), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  /** IVF-PQ composite CTE chain (k-means coarse quantizer → residual PQ
    * codes → ADC over probed cells, ranked candidates as `rk`) — the
    * DuckDB twin of Similarity.ivfPqTopK, shared by the top-k oracle and
    * its recall@k evaluation. Requires `nrm` in scope.
    */
  private val ivfpqCtes: String = s"""sd AS (SELECT vec_id, embedding,
                ${h60("CAST(vec_id AS VARCHAR)")} AS hv FROM embeddings),
         seeds AS (SELECT vec_id, embedding, hv,
                   row_number() OVER (ORDER BY hv, vec_id) AS cid
                   FROM sd QUALIFY cid <= 8),
         c0 AS (SELECT s.cid, s.embedding AS cvec, n.nrm AS cnrm
                FROM seeds s JOIN nrm n ON n.vec_id = s.vec_id),
         ${kmeansIterSql(1, "c0")},
         ${kmeansIterSql(2, "c1")},
         af AS (SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) DESC, c.cid) AS r
                FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN c2 c),
         asnf AS (SELECT vec_id, cid FROM af WHERE r = 1),
         resid AS (SELECT a.vec_id, a.cid,
                 list_transform(generate_series(1, 64),
                   i -> CAST(e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE AS REAL)) AS res
                 FROM asnf a JOIN embeddings e ON e.vec_id = a.vec_id
                 JOIN c2 c ON c.cid = a.cid),
         cbseeds AS (SELECT vec_id, res,
                     row_number() OVER (ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id) AS code
                     FROM resid QUALIFY code <= 8),
         ss AS (SELECT unnest(generate_series(0, 3)) AS s),
         cb AS (SELECT ss.s, code, list_slice(res, ss.s*16+1, ss.s*16+16) AS cwv
                FROM cbseeds CROSS JOIN ss),
         cbn AS (SELECT s, code, cwv, ${dot16("cwv", "cwv")} AS cc FROM cb),
         subv AS (SELECT r.vec_id, r.cid, ss.s,
                         list_slice(r.res, ss.s*16+1, ss.s*16+16) AS sv
                  FROM resid r CROSS JOIN ss),
         subn AS (SELECT vec_id, cid, s, sv, ${dot16("sv", "sv")} AS vv FROM subv),
         enc AS (SELECT vec_id, cid, s, code, cc,
                 row_number() OVER (PARTITION BY vec_id, s ORDER BY
                   vv + cc - 2.0 * ${dot16("sv", "cwv")} ASC, code) AS r
                 FROM subn JOIN cbn USING (s)),
         codes AS (SELECT vec_id, cid, s, code, cc FROM enc WHERE r = 1),
         csub AS (SELECT c.cid, ss.s, list_slice(c.cvec, ss.s*16+1, ss.s*16+16) AS csv
                  FROM c2 c CROSS JOIN ss),
         ccx AS (SELECT cid, s, code, ${dot16("csv", "cwv")} AS cx
                 FROM csub JOIN cbn USING (s)),
         cnorm AS (SELECT cid, ${dot64("cvec", "cvec")} AS ccn FROM c2),
         wide AS (SELECT vec_id, cid,
                   max(CASE WHEN s = 0 THEN code END) AS c0, max(CASE WHEN s = 0 THEN cc END) AS cc0, max(CASE WHEN s = 0 THEN cx END) AS cx0,
                   max(CASE WHEN s = 1 THEN code END) AS c1, max(CASE WHEN s = 1 THEN cc END) AS cc1, max(CASE WHEN s = 1 THEN cx END) AS cx1,
                   max(CASE WHEN s = 2 THEN code END) AS c2, max(CASE WHEN s = 2 THEN cc END) AS cc2, max(CASE WHEN s = 2 THEN cx END) AS cx2,
                   max(CASE WHEN s = 3 THEN code END) AS c3, max(CASE WHEN s = 3 THEN cc END) AS cc3, max(CASE WHEN s = 3 THEN cx END) AS cx3
                  FROM codes JOIN ccx USING (cid, s, code) GROUP BY 1, 2),
         widen AS (SELECT w.*,
                   sqrt(cn.ccn + 2.0 * (cx0 + cx1 + cx2 + cx3) + (cc0 + cc1 + cc2 + cc3)) AS rnrm
                   FROM wide w JOIN cnorm cn USING (cid)),
         q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, n.nrm AS qnrm
               FROM embeddings e JOIN nrm n USING (vec_id) WHERE e.vec_id < 10),
         prq AS (SELECT query_id, c.cid, ${dot64("qv", "c.cvec")} AS qcent,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY ${dot64("qv", "c.cvec")} / (qnrm * c.cnrm) DESC, c.cid) AS crnk
                 FROM q CROSS JOIN c2 c),
         probes AS (SELECT query_id, cid, qcent FROM prq WHERE crnk <= 2),
         qsub AS (SELECT query_id, ss.s, list_slice(qv, ss.s*16+1, ss.s*16+16) AS qs
                  FROM q CROSS JOIN ss),
         adc AS (SELECT query_id, s, code, ${dot16("qs", "cwv")} AS qc
                 FROM qsub JOIN cbn USING (s)),
         pairs AS (SELECT p.query_id, w.vec_id, qq.qnrm, w.rnrm, p.qcent,
                          a0.qc AS qc0, a1.qc AS qc1, a2.qc AS qc2, a3.qc AS qc3
                   FROM widen w
                   JOIN probes p ON p.cid = w.cid AND w.vec_id <> p.query_id
                   JOIN q qq ON qq.query_id = p.query_id
                   JOIN adc a0 ON a0.query_id = p.query_id AND a0.s = 0 AND a0.code = w.c0
                   JOIN adc a1 ON a1.query_id = p.query_id AND a1.s = 1 AND a1.code = w.c1
                   JOIN adc a2 ON a2.query_id = p.query_id AND a2.s = 2 AND a2.code = w.c2
                   JOIN adc a3 ON a3.query_id = p.query_id AND a3.s = 3 AND a3.code = w.c3),
         sc AS (SELECT query_id, vec_id,
                       (qcent + qc0 + qc1 + qc2 + qc3) / (qnrm * rnrm) AS cos FROM pairs),
         rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk FROM sc)"""

  /** Hyperplane-LSH signature CTE chain (dps → sigs), the DuckDB twin of
    * Similarity.lshSignature — identical md5-derived ±1 plane literals.
    */
  private val sigs: String = {
    val planeSign =
      s"(CASE WHEN ${h60("'plane' || p || '_' || i")} % 2 = 1 THEN 1.0 ELSE -1.0 END)"
    s"""dps AS (SELECT e.vec_id, ps.p,
             list_sum(list_transform(generate_series(1, 64),
               i -> e.embedding[i]::DOUBLE * $planeSign)) AS dp
           FROM embeddings e
           CROSS JOIN (SELECT unnest(generate_series(0, ${Similarity.NumPlanes - 1})) AS p) ps),
        sigs AS (SELECT vec_id,
                 CAST(sum(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS sig
                 FROM dps GROUP BY 1)"""
  }

  /** Full MinHash+LSH CTE chain ending in a `pairs` CTE (verified
    * candidate pairs at `threshold`), shared by the pair and survivor
    * queries.
    */
  /** Okapi BM25 CTE chain over the fixed ('spark','window','join') query
    * set, ending in `bm25` (doc_id, score) — the DuckDB twin of
    * TextAnalysis.bm25TopK, shared by the lexical top-k and the hybrid
    * RRF fusion.
    */
  private val bm25Ctes = s"""tkb AS (
           SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tk FROM documents),
         dlb AS (SELECT doc_id, tk, len(tk)::DOUBLE AS dl FROM tkb),
         stb AS (SELECT count(*)::DOUBLE AS nd, avg(dl) AS avgdl FROM dlb),
         tfb AS (SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf
                FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM dlb)
                WHERE tok IN ('spark', 'window', 'join')
                GROUP BY 1, 2, 3),
         dfb AS (SELECT tok, count(*)::DOUBLE AS df FROM tfb GROUP BY 1),
         trm AS (SELECT doc_id,
                  CAST(floor(
                    (floor(ln((nd - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0 + 0.5)
                       / 1000000.0)
                    * (tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                    * 1000000.0 + 0.5) AS BIGINT) AS g
                  FROM tfb JOIN dfb USING (tok) CROSS JOIN stb),
         bm25 AS (SELECT doc_id,
                  floor(CAST(sum(g) AS BIGINT) / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS score
                  FROM trm GROUP BY 1)"""

  /** Shared MinHash prefix: tok → shingles → per-perm signature → LSH
    * band rows (used by both the batch self-join and incremental oracles).
    */
  private def bandsPrefix: String = bandsPrefixFrom(tok)

  /** [[bandsPrefix]] with a custom `tok` CTE (e.g. a doc sample). */
  private def bandsPrefixFrom(tokCte: String): String = {
    val sigCols = (Dedup.minhashPerms.zipWithIndex
      .map { case ((a, b), j) => s"min((hm * $a + $b) % ${Dedup.P}) AS mh$j" } ++
      Dedup.subPerms.zipWithIndex
        .map { case ((a, b), j) => s"min((hm * $a + $b) % ${Dedup.P}) AS su$j" })
      .mkString(", ")
    val rows = Dedup.NumPerms / Dedup.Bands
    val skExprs = (0 until Dedup.SubBands).map { sb =>
      (0 until Dedup.SubRows).map(r => s"su${sb * Dedup.SubRows + r}")
        .mkString(" || '_' || ") + s" AS sk$sb"
    }.mkString(", ")
    val bandSelects = (0 until Dedup.Bands).map { bnd =>
      val key = (0 until rows).map(r => s"mh${bnd * rows + r}").mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $key AS key, $skExprs FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $tokCte, $sh,
        hm AS (SELECT doc_id, shingle % ${Dedup.P} AS hm FROM sh),
        sig AS (SELECT doc_id, $sigCols FROM hm GROUP BY 1),
        bands AS ($bandSelects)"""
  }

  private def minhashWith(threshold: Double): String =
    s"""$bandsPrefix,
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands x JOIN bands y
                   ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
        $jaccardTail,
        prc AS (SELECT pr.* FROM pr JOIN cand USING (doc_a, doc_b)),
        pairs AS (SELECT doc_a, doc_b, floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
                  FROM prc JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                  WHERE floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 >= $threshold)"""

  /** Incremental-dedup replay: candidates are (corpus band ⋈ batch band)
    * plus (batch ⋈ batch); the batch is doc_id % 10 = 0. Orientation is
    * always (doc_a = existing/lower partner, doc_b = batch doc).
    */
  private def incrementalWith(threshold: Double): String =
    s"""$bandsPrefix,
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands x JOIN bands y
                   ON x.band = y.band AND x.key = y.key
                 WHERE (x.doc_id % 10 <> 0 AND y.doc_id % 10 = 0)
                    OR (x.doc_id % 10 = 0 AND y.doc_id % 10 = 0
                        AND x.doc_id < y.doc_id)),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pr AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
               FROM cand c
               JOIN sh a ON a.doc_id = c.doc_a
               JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
               GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b, floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
                  FROM pr JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                  WHERE floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 >= $threshold),
        best AS (SELECT doc_b AS doc_id, min(doc_a) AS dup_of,
                        arg_min(jaccard, doc_a) AS jaccard
                 FROM pairs GROUP BY 1)"""

  /** (label, LSH-band)-blocked embedding near-dup pairs at cos ≥ 0.4 —
    * the DuckDB twin of Similarity.embeddingDedup, shared by the pair and
    * survivor queries. Requires the `nrm` and `sigs` CTEs in scope.
    */
  private val embPairs = s"""
       bands AS (SELECT s.vec_id, b.band, (s.sig >> (2 * b.band)) & 3 AS key
                 FROM sigs s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
       cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                FROM bands x JOIN bands y
                  ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
       epairs AS (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
                floor((${dot64("a.embedding", "b.embedding")} / (na.nrm * nb.nrm)) * 10000.0 + 0.5) / 10000.0 AS cos_sim
         FROM embeddings a
         JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
         JOIN cand ON cand.vec_a = a.vec_id AND cand.vec_b = b.vec_id
         JOIN nrm na ON na.vec_id = a.vec_id
         JOIN nrm nb ON nb.vec_id = b.vec_id
         WHERE floor((${dot64("a.embedding", "b.embedding")} / (na.nrm * nb.nrm)) * 10000.0 + 0.5) / 10000.0 >= 0.4)"""

  /** One Lloyd iteration as CTEs: assignment `asn$i` against centroid
    * table `$prev`, fixed-point mean update ending in `c$i` — the DuckDB
    * twin of Similarity.assignToCentroids + updateCentroids.
    */
  private def kmeansIterSql(i: Int, prev: String): String = s"""
       a$i AS (SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) DESC, c.cid) AS r
               FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN $prev c),
       asn$i AS (SELECT vec_id, cid FROM a$i WHERE r = 1),
       flat$i AS (SELECT s.cid, i.pos, e.embedding[i.pos]::DOUBLE AS v
                  FROM asn$i s JOIN embeddings e ON e.vec_id = s.vec_id
                  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
       cm$i AS (SELECT cid, pos,
                       CAST(sum(CAST(floor(v * 10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / 10000000.0 / count(*) AS cv
                FROM flat$i GROUP BY 1, 2),
       cl$i AS (SELECT cid, list(CAST(cv AS REAL) ORDER BY pos) AS cvec FROM cm$i GROUP BY 1),
       c$i AS (SELECT cid, cvec, sqrt(${dot64("cvec", "cvec")}) AS cnrm FROM cl$i)"""

  /** Shared IVF search tail (final assignment against centroid CTE `cent`,
    * probe-2, exact rerank, top-5) — ends the statement.
    */
  private def ivfTail(cent: String): String = s"""
       af AS (SELECT e.vec_id, c.cid,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) DESC, c.cid) AS r
              FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN $cent c),
       asnf AS (SELECT vec_id, cid FROM af WHERE r = 1),
       q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
       pr AS (SELECT query_id, c.cid,
              row_number() OVER (PARTITION BY query_id
                ORDER BY ${dot64("qv", "c.cvec")} / (nq.nrm * c.cnrm) DESC, c.cid) AS crnk
              FROM q JOIN nrm nq ON nq.vec_id = query_id CROSS JOIN $cent c),
       probes AS (SELECT query_id, cid FROM pr WHERE crnk <= 2),
       sc AS (SELECT p.query_id, s.vec_id AS neighbor_id,
                     ${dot64("qv", "e.embedding")} / (nq.nrm * nc.nrm) AS cos
              FROM probes p
              JOIN asnf s ON s.cid = p.cid
              JOIN q ON q.query_id = p.query_id
              JOIN embeddings e ON e.vec_id = s.vec_id AND e.vec_id <> p.query_id
              JOIN nrm nq ON nq.vec_id = p.query_id
              JOIN nrm nc ON nc.vec_id = s.vec_id),
       rk AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                     cos FROM sc)
       SELECT query_id, neighbor_id, rnk, floor(cos * 10000.0 + 0.5) / 10000.0 AS score
       FROM rk WHERE rnk <= 5"""

  /** k-means‖-style seeding replay, ending in CTE s`nCent` — the DuckDB
    * twin of Similarity.kmeansParSeeds: hash-min first candidate, `rounds`
    * oversampling passes that each add the `ell` farthest vectors
    * (min max-cos, ties → vec_id), then the greedy farthest-point
    * reduction of the constant-sized candidate sample to nCent seeds
    * (cids in selection order) — the same chain the Spark side runs
    * driver-side on its collected sample.
    */
  private def kparSeedSql(nCent: Int, ell: Int, rounds: Int): String = {
    val c0 = s"""cand0 AS MATERIALIZED (SELECT e.vec_id, e.embedding AS cvec, n.nrm AS cnrm
         FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id
         ORDER BY ${h60("CAST(e.vec_id AS VARCHAR)")}, e.vec_id LIMIT 1)"""
    val roundCtes = (1 to rounds).map { r =>
      s"""rf$r AS (SELECT e.vec_id,
             max(${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm)) AS closest
           FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN cand${r - 1} c
           GROUP BY 1),
         rp$r AS (SELECT vec_id FROM rf$r ORDER BY closest ASC, vec_id LIMIT $ell),
         cand$r AS MATERIALIZED (SELECT * FROM cand${r - 1} UNION ALL
                 SELECT e.vec_id, e.embedding AS cvec, n.nrm AS cnrm
                 FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id
                 JOIN rp$r ON rp$r.vec_id = e.vec_id)"""
    }
    // duplicate candidate rows (a re-picked vector) collapse by id; the
    // duplicates are identical rows, so any_value is deterministic here
    val cset =
      s"""cset AS MATERIALIZED (SELECT vec_id, any_value(cvec) AS cvec, any_value(cnrm) AS cnrm
           FROM cand$rounds GROUP BY 1)"""
    val g1 = s"""g1 AS MATERIALIZED (SELECT 1 AS cid, vec_id, cvec, cnrm FROM cand0)"""
    val gsteps = (2 to nCent).map { j =>
      s"""gf$j AS (SELECT c.vec_id,
             max(${dot64("c.cvec", "g.cvec")} / (c.cnrm * g.cnrm)) AS closest
           FROM cset c CROSS JOIN g${j - 1} g
           WHERE c.vec_id NOT IN (SELECT vec_id FROM g${j - 1})
           GROUP BY 1),
         gp$j AS (SELECT vec_id FROM gf$j ORDER BY closest ASC, vec_id LIMIT 1),
         g$j AS MATERIALIZED (SELECT * FROM g${j - 1} UNION ALL
                 SELECT $j AS cid, c.vec_id, c.cvec, c.cnrm
                 FROM cset c JOIN gp$j ON gp$j.vec_id = c.vec_id)"""
    }
    val fin = s"""s$nCent AS (SELECT cid, cvec, cnrm FROM g$nCent)"""
    ((c0 +: roundCtes) ++ Seq(cset, g1) ++ gsteps :+ fin).mkString(",\n")
  }

  /** Per-doc quality + language scoring CTEs (t2 → scored), the DuckDB
    * twin of TextAnalysis.withQuality + withLangId. Requires `tok`.
    */
  // NOTE: plain (non-interpolated) string — backslashes stay literal, so
  // '\s' here equals the '\\s' written in the s-interpolated oracles
  // (the s interpolator processes escapes even in triple quotes)
  private val scoredCtes = """
       t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                     len(regexp_extract_all(text, '[^a-z0-9\s]')) AS punct,
                     length(text) AS nchars,
                     len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops,
                     len(list_filter(tk, x -> x = 'the')) AS c_en,
                     len(list_filter(tk, x -> x = 'der')) AS c_de,
                     len(list_filter(tk, x -> x = 'el')) AS c_es,
                     len(list_filter(tk, x -> x = 'le')) AS c_fr
              FROM tok),
       scored AS (SELECT doc_id, n_tokens,
              floor((least(1.0, n_tokens / 100.0) * 0.4
                    + (1.0 - punct * 1.0 / nchars) * 0.3
                    + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality,
              CASE WHEN c_en > 0 AND c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
                   WHEN c_de > 0 AND c_de >= greatest(c_es, c_fr) THEN 'de'
                   WHEN c_es > 0 AND c_es >= c_fr THEN 'es'
                   WHEN c_fr > 0 THEN 'fr'
                   ELSE 'und' END AS pred_lang
              FROM t2)"""

  private val sh8 =
    s"""sh8 AS (SELECT doc_id, CAST(${h60("sg")} AS BIGINT) AS shingle
         FROM (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(tk) >= 8
                THEN list_transform(generate_series(1, len(tk)-7),
                                    i -> array_to_string(tk[i:i+7], ' '))
                ELSE []::VARCHAR[] END)) AS sg FROM tok))"""

  /** Quantizer-cell + sub-band candidate chain with exact cosines as
    * `spairs` — the dedup_semantic replica, shared with the blocked kNN
    * graph oracle. Requires `nrm` and `sigs` in scope.
    */
  private val semPairCtes: String = s"""sd AS (SELECT vec_id, embedding, ${h60("CAST(vec_id AS VARCHAR)")} AS hv
                FROM embeddings),
         seeds AS (SELECT vec_id, embedding, hv,
                   row_number() OVER (ORDER BY hv, vec_id) AS cid
                   FROM sd QUALIFY cid <= 8),
         c0 AS (SELECT s.cid, s.embedding AS cvec, n.nrm AS cnrm
                FROM seeds s JOIN nrm n ON n.vec_id = s.vec_id),
         ${kmeansIterSql(1, "c0")},
         ${kmeansIterSql(2, "c1")},
         af AS (SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) DESC, c.cid) AS r
                FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN c2 c),
         asnf AS (SELECT vec_id, cid FROM af WHERE r = 1),
         szs AS (SELECT cid, count(*) AS csize FROM asnf GROUP BY 1),
         cs AS (SELECT a.cid, a.vec_id AS vec_a, b.vec_id AS vec_b
                FROM asnf a JOIN asnf b ON b.cid = a.cid AND a.vec_id < b.vec_id
                JOIN szs ON szs.cid = a.cid AND szs.csize <= 64),
         bnd AS (SELECT a.cid, a.vec_id, bb.band, (s.sig >> (4 * bb.band)) & 15 AS key
                 FROM asnf a
                 JOIN szs ON szs.cid = a.cid AND szs.csize > 64
                 JOIN sigs s ON s.vec_id = a.vec_id
                 CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS band) bb),
         cb AS (SELECT DISTINCT x.cid, x.vec_id AS vec_a, y.vec_id AS vec_b
                FROM bnd x JOIN bnd y ON y.cid = x.cid AND y.band = x.band
                  AND y.key = x.key AND x.vec_id < y.vec_id),
         cand AS (SELECT * FROM cs UNION ALL SELECT * FROM cb),
         spairs AS (SELECT c.cid, c.vec_a, c.vec_b,
                          ${dot64("ea.embedding", "eb.embedding")} / (na.nrm * nb.nrm) AS cos
                   FROM cand c
                   JOIN embeddings ea ON ea.vec_id = c.vec_a
                   JOIN embeddings eb ON eb.vec_id = c.vec_b
                   JOIN nrm na ON na.vec_id = c.vec_a
                   JOIN nrm nb ON nb.vec_id = c.vec_b)"""

  def all: Map[String, String] = Map(
    // CCNet terciles: doc-level LM scores (the text_lm_score chain),
    // per-lang NTILE(3) on (avg_nll, doc_id); bucket means divide one
    // exact integer sum of the 1e-4-grid scores
    "corpus_ccnet_buckets" -> """WITH tk AS (
           SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         vocab AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab),
         sc AS (SELECT doc_id, tf,
                       CAST(floor(ln(n_total / cnt) * 1000000.0 + 0.5) AS BIGINT) AS nll6
                FROM tf JOIN vocab USING (tok) CROSS JOIN tot),
         d AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                      floor(CAST(sum(tf * nll6) AS DOUBLE) / 1000000.0
                            / CAST(sum(tf) AS BIGINT)
                            * 10000.0 + 0.5) / 10000.0 AS avg_nll
               FROM sc GROUP BY 1),
         j AS (SELECT d.doc_id, d.n_tokens, d.avg_nll, doc.lang
               FROM d JOIN documents doc USING (doc_id)),
         r AS (SELECT *, CAST(ntile(3) OVER (PARTITION BY lang
                         ORDER BY avg_nll, doc_id) AS BIGINT) AS bucket
               FROM j)
         SELECT lang, bucket,
                CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS tier,
                count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                floor(CAST(sum(CAST(floor(avg_nll * 10000.0 + 0.5) AS BIGINT))
                           AS DOUBLE) / 10000.0 / count(*)
                      * 10000.0 + 0.5) / 10000.0 AS mean_nll
         FROM r GROUP BY 1, 2, 3""",

    // RAKE: stopword-free islands via running stop count, word
    // degree/freq on a 1e-6 grid, phrase = exact long sum of word grids
    "text_rake_keyphrases" -> """WITH tk0 AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
           FROM documents),
         tkp AS (SELECT doc_id, toks,
                        unnest(generate_series(1, len(toks))) AS pos
                 FROM tk0),
         tk AS (SELECT doc_id, pos, toks[pos] AS tok,
                       (toks[pos] IN ('the','a','of','and','to','in','is')
                        OR toks[pos] = '') AS is_stop
                FROM tkp),
         g AS (SELECT *, sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
               FROM tk),
         ph AS (SELECT doc_id, grp, pos, tok,
                       count(*) OVER (PARTITION BY doc_id, grp) AS plen
                FROM g WHERE NOT is_stop),
         w6 AS (SELECT tok,
                       CAST(floor(CAST(sum(plen) AS DOUBLE) / count(*)
                                  * 1000000.0 + 0.5) AS BIGINT) AS wscore6
                FROM ph GROUP BY 1),
         sc AS (SELECT doc_id, grp,
                       string_agg(tok, ' ' ORDER BY pos) AS phrase,
                       CAST(sum(wscore6) AS BIGINT) AS ps6
                FROM ph JOIN w6 USING (tok) GROUP BY 1, 2)
         SELECT phrase, count(*) AS n_occur,
                floor(CAST(max(ps6) AS DOUBLE) / 1000000.0 * 10000.0 + 0.5)
                  / 10000.0 AS score
         FROM sc GROUP BY 1
         ORDER BY max(ps6) DESC, phrase LIMIT 50""",

    "contamination_check" -> s"""WITH $tok, $sh8,
         rare8 AS (SELECT shingle FROM sh8 GROUP BY 1 HAVING count(*) <= 50),
         shc AS (SELECT sh8.doc_id, sh8.shingle FROM sh8 JOIN rare8 USING (shingle)),
         f AS (SELECT s.doc_id, s.shingle, (s.doc_id < 50) AS is_test FROM shc s)
         SELECT tr.doc_id AS train_id, te.doc_id AS test_id, count(*) AS shared_ngrams
         FROM (SELECT doc_id, shingle FROM f WHERE NOT is_test) tr
         JOIN (SELECT doc_id, shingle FROM f WHERE is_test) te USING (shingle)
         GROUP BY 1, 2""",

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
         FROM documents GROUP BY 1""",

    "corpus_decontaminated" -> s"""WITH $tok, $sh8,
         rare8 AS (SELECT shingle FROM sh8 GROUP BY 1 HAVING count(*) <= 50),
         shc AS (SELECT sh8.doc_id, sh8.shingle FROM sh8 JOIN rare8 USING (shingle)),
         f AS (SELECT s.doc_id, s.shingle, (s.doc_id < 50) AS is_test FROM shc s),
         cp AS (SELECT tr.doc_id AS train_id, te.doc_id AS test_id, count(*) AS shared
                FROM (SELECT doc_id, shingle FROM f WHERE NOT is_test) tr
                JOIN (SELECT doc_id, shingle FROM f WHERE is_test) te USING (shingle)
                GROUP BY 1, 2),
         bad AS (SELECT DISTINCT train_id AS doc_id FROM cp WHERE shared >= 2)
         SELECT doc_id, lang, source, n_chars FROM documents
         WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM bad)""",

    "dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(
                regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                '\s+', ' ', 'g'))) AS norm_hash,
              min(doc_id) AS keeper, count(*) AS n_copies
         FROM documents GROUP BY 1""",

    "dedup_threshold_curve" -> s"""${minhashWith(0.2)},
         bk AS (SELECT floor(jaccard * 10.0) / 10.0 AS j_bucket, count(*) AS n_pairs
                FROM pairs GROUP BY 1)
         SELECT j_bucket, n_pairs,
                CAST(sum(n_pairs) OVER (ORDER BY j_bucket DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS n_pairs_at_or_above
         FROM bk""",

    // band-threshold vocabulary (twin of TextAnalysis.vocabCoverage):
    // admit whole frequency bands while the cumulative type count fits.
    // Degenerate case shared with the Spark side: if no band fits the
    // table, cstar is NULL, cnt >= NULL admits nothing, and every doc
    // reports coverage 0.0 — the size bound is never violated
    "text_vocab_coverage" -> """WITH tk AS (
           SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
           FROM documents),
         vc AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
         ff AS (SELECT cnt, count(*) AS n_types FROM vc GROUP BY 1),
         cum AS (SELECT cnt, sum(n_types) OVER (ORDER BY cnt DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_or_above
                 FROM ff),
         cs AS (SELECT min(cnt) AS cstar FROM cum WHERE n_at_or_above <= 12),
         vocab AS (SELECT tok FROM vc CROSS JOIN cs WHERE cnt >= cstar)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                floor((1.0 - sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
                       / count(*)) * 10000.0 + 0.5) / 10000.0 AS coverage
         FROM tk LEFT JOIN vocab v USING (tok)
         GROUP BY 1""",

    "quality_percentiles" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         q AS (SELECT doc_id,
                floor((least(1.0, n_tokens / 100.0) * 0.4
                      + (1.0 - punct * 1.0 / nchars) * 0.3
                      + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
               FROM t2)
         SELECT d.lang, count(*) AS n_docs,
                floor(quantile_cont(q.quality, 0.1) * 10000.0 + 0.5) / 10000.0 AS p10,
                floor(quantile_cont(q.quality, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
                floor(quantile_cont(q.quality, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
                floor((sum(CASE WHEN q.quality < 0.55 THEN 1 ELSE 0 END) * 1.0
                       / count(*)) * 10000.0 + 0.5) / 10000.0 AS below_cut
         FROM documents d JOIN q USING (doc_id)
         GROUP BY 1""",

    "corpus_dedup_report" -> s"""${minhashWith(0.5)},
         ex AS (SELECT doc_id,
                       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_exact_dup
                FROM documents),
         nd AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
         SELECT d.source, count(*) AS n_docs,
                CAST(sum(CASE WHEN ex.is_exact_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
                CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                floor((1.0 - sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                       / count(*)) * 10000.0 + 0.5) / 10000.0 AS keep_rate
         FROM documents d
         JOIN ex USING (doc_id)
         LEFT JOIN nd USING (doc_id)
         GROUP BY 1""",

    "ann_knn_label" -> s"""WITH $nrm,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         vt AS (SELECT query_id, e.label, count(*) AS votes
                FROM bf JOIN embeddings e ON e.vec_id = bf.neighbor_id
                GROUP BY 1, 2),
         pk AS (SELECT query_id, label AS pred_label, votes FROM (
                  SELECT query_id, label, votes,
                         row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS r
                  FROM vt) WHERE r = 1)
         SELECT pk.query_id, pk.pred_label, pk.votes, t.label AS true_label,
                pk.pred_label = t.label AS correct
         FROM pk JOIN embeddings t ON t.vec_id = pk.query_id""",

    // document-frequency cap (<= 50) mirrors Dedup.capShingles: boilerplate
    // shingles are dropped BEFORE sizes/intersections on both engines
    "dedup_ngram_jaccard" -> s"""WITH $tok, $sh,
         rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 50),
         shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT doc_a, doc_b, floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
         FROM pr JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         WHERE floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 >= 0.6""",

    "dedup_minhash_lsh" -> s"""${minhashWith(0.5)}
          SELECT doc_a, doc_b, jaccard FROM pairs""",

    // sub-blocked candidate path with the cap SMALL enough (2) to bind at
    // test scale: buckets of size <= 2 self-join all-pairs; oversized
    // buckets explode into the two half-band sub-keys and pair only
    // within sub-buckets that are themselves <= 2 — the exact replay of
    // Dedup.candFromBands' flood guard
    "dedup_lsh_subblocked" -> s"""$bandsPrefix,
         bsz AS (SELECT band, key, count(*) AS bsz FROM bands GROUP BY 1, 2),
         smallb AS (SELECT b.doc_id, b.band, b.key
                    FROM bands b JOIN bsz USING (band, key) WHERE bsz <= 2),
         sp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM smallb x JOIN smallb y
                  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         bigb AS (SELECT b.doc_id, b.band, b.key, u.sb,
                         CASE u.sb WHEN 0 THEN b.sk0 WHEN 1 THEN b.sk1
                                   ELSE b.sk2 END AS sk
                  FROM bands b JOIN bsz USING (band, key)
                  CROSS JOIN (SELECT unnest([0, 1, 2]) AS sb) u WHERE bsz > 2),
         ssz AS (SELECT band, key, sb, sk, count(*) AS ssz
                 FROM bigb GROUP BY 1, 2, 3, 4),
         bigok AS (SELECT g.doc_id, g.band, g.key, g.sb, g.sk FROM bigb g
                   JOIN ssz USING (band, key, sb, sk) WHERE ssz <= 2),
         bp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM bigok x JOIN bigok y
                  ON x.band = y.band AND x.key = y.key AND x.sb = y.sb
                 AND x.sk = y.sk AND x.doc_id < y.doc_id),
         cand AS (SELECT DISTINCT doc_a, doc_b FROM
                  (SELECT * FROM sp UNION ALL SELECT * FROM bp)),
         $jaccardTail,
         prc AS (SELECT pr.* FROM pr JOIN cand USING (doc_a, doc_b)),
         pairs AS (SELECT doc_a, doc_b,
                          floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
                   FROM prc JOIN sz sa ON sa.doc_id = doc_a
                   JOIN sz sb ON sb.doc_id = doc_b)
         SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.2""",

    // directed containment |S(a)∩S(b)|/|S(a)| over df-capped 8-gram
    // shingles (doc_a near-contained in doc_b)
    "dedup_containment" -> s"""WITH $tok, $sh8,
         rare8 AS (SELECT shingle FROM sh8 GROUP BY 1 HAVING count(*) <= 50),
         shc AS (SELECT sh8.doc_id, sh8.shingle FROM sh8 JOIN rare8 USING (shingle)),
         sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
         pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                GROUP BY 1, 2)
         SELECT doc_a, doc_b, sa.n AS na, inter,
                floor((inter / sa.n) * 10000.0 + 0.5) / 10000.0 AS containment
         FROM pr JOIN sz sa ON sa.doc_id = doc_a
         WHERE floor((inter / sa.n) * 10000.0 + 0.5) / 10000.0 >= 0.6""",

    "text_bow_embedding" -> s"""
         WITH tf AS (SELECT doc_id, CAST(${h60("tok")} % 64 AS BIGINT) AS idx,
                            count(*) AS tf
                     FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
                           FROM documents)
                     WHERE tok <> '' GROUP BY 1, 2),
         nr AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS ssq FROM tf GROUP BY 1)
         SELECT tf.doc_id, idx,
                floor((tf / sqrt(ssq)) * 10000.0 + 0.5) / 10000.0 AS w
         FROM tf JOIN nr ON tf.doc_id = nr.doc_id""",

    "ann_filtered_topk" -> s"""WITH $nrm,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                       ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                FROM q JOIN embeddings c ON c.vec_id <> query_id AND c.label = 3
                JOIN nrm nq ON nq.vec_id = query_id
                JOIN nrm nc ON nc.vec_id = c.vec_id),
         rk AS (SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                       cos FROM sc)
         SELECT query_id, neighbor_id, rnk, floor((cos) * 10000.0 + 0.5) / 10000.0 AS score FROM rk WHERE rnk <= 5""",

    "dedup_incremental" -> s"""${incrementalWith(0.5)}
          SELECT d.doc_id, b.dup_of, b.jaccard
          FROM documents d LEFT JOIN best b USING (doc_id)
          WHERE d.doc_id % 10 = 0""",

    "dedup_survivors" -> s"""${minhashWith(0.5)}
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id NOT IN (SELECT DISTINCT doc_b FROM pairs)""",

    // transitive closure of the SAME pairs the Spark side clusters:
    // min-reachable-label per node ≡ Spark's min-label propagation fixpoint
    "dedup_clusters" -> s"""WITH RECURSIVE ${minhashWith(0.5).stripPrefix("WITH")},
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION SELECT doc_b, doc_a FROM pairs),
          reach(id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
          comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
          csz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1)
          SELECT doc_id, cluster_id, csize FROM comp JOIN csz USING (cluster_id)""",

    "dedup_cluster_survivors" -> s"""WITH RECURSIVE ${minhashWith(0.5).stripPrefix("WITH")},
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION SELECT doc_b, doc_a FROM pairs),
          reach(id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
          comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1)
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)""",

    // fixed-point quality sum (quality is 4-decimal → ×10⁴ exact) keeps the
    // mean independent of summation order on both engines
    "corpus_stats" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         q AS (SELECT doc_id,
                floor((least(1.0, n_tokens / 100.0) * 0.4
                      + (1.0 - punct * 1.0 / nchars) * 0.3
                      + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
               FROM t2)
         SELECT d.source, d.lang, count(*) AS n_docs,
                CAST(sum(d.n_chars) AS BIGINT) AS n_chars_total,
                floor((CAST(sum(CAST(floor(q.quality * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                       / 10000.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_quality,
                floor(((count(*) - count(DISTINCT md5(d.text))) * 1.0 / count(*))
                      * 10000.0 + 0.5) / 10000.0 AS dup_rate
         FROM documents d JOIN q ON q.doc_id = d.doc_id
         GROUP BY 1, 2""",

    // brute-force O(n²) over the 60-bit fingerprints: equals the Spark
    // side's pigeonhole banding (complete for hamming <= SimhashBands-1)
    // as long as no band bucket exceeds the cap — the cap never binds at
    // oracle scale, so brute force is the stronger, independent check
    "dedup_simhash" -> {
      val sums = (0 until Dedup.SimhashBits)
        .map(i => s"sum(CASE WHEN (hm // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END) AS s$i")
        .mkString(", ")
      val fp = (0 until Dedup.SimhashBits)
        .map(i => s"(CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $tok,
          tk2 AS (SELECT doc_id, unnest(list_distinct(tk)) AS tok FROM tok),
          hm AS (SELECT doc_id, CAST(${h60("tok")} AS BIGINT) AS hm FROM tk2),
          bits AS (SELECT doc_id, $sums FROM hm GROUP BY 1),
          fp AS (SELECT doc_id, CAST($fp AS BIGINT) AS fp FROM bits)
          SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                 CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
          FROM fp x JOIN fp y ON x.doc_id < y.doc_id
          WHERE bit_count(xor(x.fp, y.fp)) <= 3"""
    },

    // banded-LSH blocking (4 bands × 2 sign bits) mirrors
    // Similarity.embeddingDedup: only pairs sharing a band are compared
    "dedup_embedding" -> s"""WITH $nrm, $sigs, $embPairs
         SELECT vec_a, vec_b, label, cos_sim FROM epairs""",

    // kNN graph from the same banded pair table, symmetrized then
    // ranked per vector (cos DESC, neighbor_id tie-break)
    "ann_knn_join" -> s"""WITH $nrm, $sigs, $embPairs,
         sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor_id, cos_sim FROM epairs
                 UNION ALL
                 SELECT vec_b AS vec_id, vec_a AS neighbor_id, cos_sim FROM epairs),
         r AS (SELECT vec_id, neighbor_id, cos_sim,
                      CAST(row_number() OVER (PARTITION BY vec_id
                        ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rnk
               FROM sym)
         SELECT vec_id, rnk, neighbor_id, cos_sim FROM r WHERE rnk <= 5""",

    // in-degree distribution of the same kNN graph (zero-in-degree mass
    // via a left join against the full id column)
    "embedding_hubness" -> s"""WITH $nrm, $sigs, $embPairs,
         sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor_id, cos_sim FROM epairs
                 UNION ALL
                 SELECT vec_b AS vec_id, vec_a AS neighbor_id, cos_sim FROM epairs),
         r AS (SELECT vec_id, neighbor_id,
                      row_number() OVER (PARTITION BY vec_id
                        ORDER BY cos_sim DESC, neighbor_id) AS rnk
               FROM sym),
         ind AS (SELECT neighbor_id AS vec_id, count(*) AS in_degree
                 FROM r WHERE rnk <= 5 GROUP BY 1)
         SELECT coalesce(in_degree, 0) AS in_degree, count(*) AS n_vectors
         FROM embeddings e LEFT JOIN ind USING (vec_id)
         GROUP BY 1""",

    // truncated-prefix (matryoshka) recall vs the full-dim exact top-k:
    // both sides brute force over the same bounded query set
    "embedding_matryoshka_recall" -> s"""WITH $nrm,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         fsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         frk AS (SELECT query_id, neighbor_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id) AS rnk
                 FROM fsc),
         gt AS (SELECT query_id, neighbor_id FROM frk WHERE rnk <= 10),
         dims AS (SELECT unnest([8, 16, 32]) AS dim),
         tsc AS (SELECT dim, query_id, c.vec_id AS neighbor_id,
                        list_sum(list_transform(generate_series(1, dim),
                          i -> qv[i]::DOUBLE * c.embedding[i]::DOUBLE))
                        / (sqrt(list_sum(list_transform(generate_series(1, dim),
                             i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                           * sqrt(list_sum(list_transform(generate_series(1, dim),
                               i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cos
                 FROM dims CROSS JOIN q
                 JOIN embeddings c ON c.vec_id <> query_id),
         trk AS (SELECT dim, query_id, neighbor_id,
                        row_number() OVER (PARTITION BY dim, query_id
                          ORDER BY cos DESC, neighbor_id) AS rnk
                 FROM tsc),
         tk AS (SELECT dim, query_id, neighbor_id FROM trk WHERE rnk <= 10)
         SELECT dim, count(DISTINCT tk.query_id) AS n_queries,
                floor(CAST(CAST(sum(CASE WHEN gt.query_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
                      / (count(DISTINCT tk.query_id) * 10) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM tk LEFT JOIN gt
           ON gt.query_id = tk.query_id AND gt.neighbor_id = tk.neighbor_id
         GROUP BY dim""",

    // knn-graph connected components: canonical undirected edges, the
    // same reach recursion as dedup_clusters
    "embedding_knn_clusters" -> s"""WITH RECURSIVE $nrm, $sigs, $embPairs,
         sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor_id, cos_sim FROM epairs
                 UNION ALL
                 SELECT vec_b AS vec_id, vec_a AS neighbor_id, cos_sim FROM epairs),
         kr AS (SELECT vec_id, neighbor_id,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
                FROM sym),
         und AS (SELECT DISTINCT least(vec_id, neighbor_id) AS a,
                        greatest(vec_id, neighbor_id) AS b
                 FROM kr WHERE rnk <= 5),
         edges AS (SELECT a AS src, b AS dst FROM und
                   UNION SELECT b, a FROM und),
         reach(id, lbl) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         comp AS (SELECT id AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
         csz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1)
         SELECT vec_id, cluster_id, csize FROM comp JOIN csz USING (cluster_id)""",

    // PageRank over the knn graph, 3 unrolled rounds of exact integer
    // arithmetic on the 1e9 grid (rg // od contribs, damped rebase)
    "embedding_pagerank" -> s"""WITH $nrm, $sigs, $embPairs,
         sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor_id, cos_sim FROM epairs
                 UNION ALL
                 SELECT vec_b AS vec_id, vec_a AS neighbor_id, cos_sim FROM epairs),
         kr AS (SELECT vec_id, neighbor_id,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
                FROM sym),
         ed AS (SELECT vec_id AS src, neighbor_id AS dst FROM kr WHERE rnk <= 5),
         og AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM ed GROUP BY 1),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         r0 AS (SELECT vec_id, CAST(1000000000 AS BIGINT) // n AS rg
                FROM embeddings CROSS JOIN nn),
         c1 AS (SELECT dst, CAST(sum(rg // od) AS BIGINT) AS insum
                FROM ed JOIN og USING (src) JOIN r0 ON r0.vec_id = ed.src GROUP BY 1),
         r1 AS (SELECT e.vec_id,
                       (15 * (CAST(1000000000 AS BIGINT) // n)
                        + 85 * coalesce(insum, 0)) // 100 AS rg
                FROM embeddings e CROSS JOIN nn LEFT JOIN c1 ON c1.dst = e.vec_id),
         c2 AS (SELECT dst, CAST(sum(rg // od) AS BIGINT) AS insum
                FROM ed JOIN og USING (src) JOIN r1 ON r1.vec_id = ed.src GROUP BY 1),
         r2 AS (SELECT e.vec_id,
                       (15 * (CAST(1000000000 AS BIGINT) // n)
                        + 85 * coalesce(insum, 0)) // 100 AS rg
                FROM embeddings e CROSS JOIN nn LEFT JOIN c2 ON c2.dst = e.vec_id),
         c3 AS (SELECT dst, CAST(sum(rg // od) AS BIGINT) AS insum
                FROM ed JOIN og USING (src) JOIN r2 ON r2.vec_id = ed.src GROUP BY 1),
         r3 AS (SELECT e.vec_id,
                       (15 * (CAST(1000000000 AS BIGINT) // n)
                        + 85 * coalesce(insum, 0)) // 100 AS rg
                FROM embeddings e CROSS JOIN nn LEFT JOIN c3 ON c3.dst = e.vec_id)
         SELECT vec_id, rg FROM r3 ORDER BY rg DESC, vec_id LIMIT 20""",

    "embedding_survivors" -> s"""WITH $nrm, $sigs, $embPairs
         SELECT e.vec_id, e.label FROM embeddings e
         WHERE e.vec_id NOT IN (SELECT DISTINCT vec_b FROM epairs)""",

    // deterministic centroids: fixed-point integer sums (floor(v·1e7+0.5))
    // replayed bit-for-bit from Similarity.ivfTopK
    "ann_ivf_topk" -> s"""WITH $nrm,
         flat AS (SELECT label, i.pos, embedding[i.pos]::DOUBLE AS v
                  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         cent AS (SELECT label, pos,
                         CAST(sum(CAST(floor(v * 10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                           / 10000000.0 / count(*) AS cv
                  FROM flat GROUP BY 1, 2),
         cvecs AS (SELECT label, list(CAST(cv AS REAL) ORDER BY pos) AS cvec FROM cent GROUP BY 1),
         cn AS (SELECT label, cvec, sqrt(${dot64("cvec", "cvec")}) AS cnrm FROM cvecs),
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         pr AS (SELECT query_id, cn.label,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY ${dot64("qv", "cvec")} / (nq.nrm * cn.cnrm) DESC, cn.label) AS crnk
                FROM q JOIN nrm nq ON nq.vec_id = query_id CROSS JOIN cn),
         probes AS (SELECT query_id, label FROM pr WHERE crnk <= 2),
         sc AS (SELECT p.query_id, c.vec_id AS neighbor_id,
                       ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                FROM probes p JOIN q ON q.query_id = p.query_id
                JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
                JOIN nrm nq ON nq.vec_id = p.query_id
                JOIN nrm nc ON nc.vec_id = c.vec_id),
         rk AS (SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                       cos FROM sc)
         SELECT query_id, neighbor_id, rnk, floor(cos * 10000.0 + 0.5) / 10000.0 AS score
         FROM rk WHERE rnk <= 5""",

    // int8 quantization replayed exactly: the integer dot is exact on both
    // engines, the dequant multiplies are single IEEE ops in the same order
    "ann_quantized_topk" -> s"""WITH $nrm,
         q8 AS (SELECT vec_id,
                  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale,
                  list_transform(embedding,
                    x -> CAST(floor(x::DOUBLE / (list_max(list_transform(embedding, y -> abs(y::DOUBLE))) / 127.0) + 0.5) AS INT)) AS qvec
                FROM embeddings),
         q AS (SELECT q8.vec_id AS query_id, q8.qvec AS qv, q8.scale AS qs, n.nrm AS qn
               FROM q8 JOIN nrm n ON n.vec_id = q8.vec_id WHERE q8.vec_id < 10),
         sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                  ((qs * c.scale) * list_sum(list_transform(generate_series(1, 64),
                      i -> qv[i]::BIGINT * c.qvec[i]::BIGINT))) / (qn * nc.nrm) AS cos
                FROM q JOIN q8 c ON c.vec_id <> query_id
                JOIN nrm nc ON nc.vec_id = c.vec_id),
         rk AS (SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                       cos FROM sc)
         SELECT query_id, neighbor_id, rnk, floor(cos * 10000.0 + 0.5) / 10000.0 AS score
         FROM rk WHERE rnk <= 5""",

    "ann_bruteforce_topk" -> s"""WITH $nrm,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                       ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                FROM q JOIN embeddings c ON c.vec_id <> query_id
                JOIN nrm nq ON nq.vec_id = query_id
                JOIN nrm nc ON nc.vec_id = c.vec_id),
         rk AS (SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                       cos FROM sc)
         SELECT query_id, neighbor_id, rnk, floor((cos) * 10000.0 + 0.5) / 10000.0 AS score FROM rk WHERE rnk <= 5""",

    "ann_lsh_topk" -> {
      s"""WITH $nrm, $sigs,
          q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, s.sig
                FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id WHERE e.vec_id < 10),
          sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q
                 JOIN sigs cs ON cs.sig = q.sig
                 JOIN embeddings c ON c.vec_id = cs.vec_id AND c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
          rk AS (SELECT query_id, neighbor_id,
                        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                        cos FROM sc)
          SELECT query_id, neighbor_id, rnk, floor((cos) * 10000.0 + 0.5) / 10000.0 AS score FROM rk WHERE rnk <= 5"""
    },

    "text_tokens" ->
      """SELECT doc_id,
         len(regexp_split_to_array(text, '\s+')) AS n_ws_tokens,
         len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')) AS n_bpe_tokens
         FROM documents""",

    "text_quality" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok)
         SELECT doc_id, n_tokens,
                floor((punct * 1.0 / nchars) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                floor((stops * 1.0 / n_tokens) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
                floor((least(1.0, n_tokens / 100.0) * 0.4
                      + (1.0 - punct * 1.0 / nchars) * 0.3
                      + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
         FROM t2""",

    "text_langid" -> s"""WITH $tok,
         c AS (SELECT doc_id,
                      len(list_filter(tk, x -> x = 'the')) AS c_en,
                      len(list_filter(tk, x -> x = 'der')) AS c_de,
                      len(list_filter(tk, x -> x = 'el')) AS c_es,
                      len(list_filter(tk, x -> x = 'le')) AS c_fr
               FROM tok)
         SELECT doc_id, c_en, c_de, c_es, c_fr,
                CASE WHEN c_en > 0 AND c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
                     WHEN c_de > 0 AND c_de >= greatest(c_es, c_fr) THEN 'de'
                     WHEN c_es > 0 AND c_es >= c_fr THEN 'es'
                     WHEN c_fr > 0 THEN 'fr'
                     ELSE 'und' END AS pred_lang
         FROM c""",

    "sample_stratified" -> s"""
         SELECT doc_id, lang, source, n_chars FROM documents
         WHERE ${h60("CAST(doc_id AS VARCHAR) || 'r1'")} % 100 <
               (CASE WHEN lang = 'en' THEN 50 WHEN lang = 'zh' THEN 10 ELSE 25 END)""",

    "sample_topn_per_stratum" -> s"""
         SELECT doc_id, lang, source, rnk FROM (
           SELECT doc_id, lang, source,
                  row_number() OVER (PARTITION BY lang ORDER BY
                    CAST(${h60("CAST(doc_id AS VARCHAR) || 's1'")} AS BIGINT), doc_id) AS rnk
           FROM documents)
         WHERE rnk <= 10""",

    "ann_range_search" -> s"""WITH $nrm,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                       floor((${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm))
                             * 10000.0 + 0.5) / 10000.0 AS score
                FROM q JOIN embeddings c ON c.vec_id <> query_id
                JOIN nrm nq ON nq.vec_id = query_id
                JOIN nrm nc ON nc.vec_id = c.vec_id)
         SELECT query_id, neighbor_id, score FROM sc WHERE score >= 0.35""",

    "pipeline_materialize" -> s"""WITH $tok,
         $scoredCtes,
         keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         SELECT d.doc_id, d.source, s.n_tokens, s.quality
         FROM documents d
         JOIN keep USING (doc_id)
         JOIN scored s ON s.doc_id = d.doc_id
         WHERE s.pred_lang = 'en' AND s.quality >= 0.55""",

    // full pipeline: exact keepers + LSH near-dup survivors + lang/quality
    // gates; `pairs` comes from the same MinHash chain as dedup_minhash_lsh
    "pipeline_materialize_full" -> s"""${minhashWith(0.5)},
         $scoredCtes,
         keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         ndrop AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
         SELECT d.doc_id, d.source, s.n_tokens, s.quality
         FROM documents d
         JOIN keep USING (doc_id)
         LEFT JOIN ndrop ON ndrop.doc_id = d.doc_id
         JOIN scored s ON s.doc_id = d.doc_id
         WHERE ndrop.doc_id IS NULL AND s.pred_lang = 'en' AND s.quality >= 0.55""",

    "curation_funnel" -> s"""${minhashWith(0.5)},
         $scoredCtes,
         keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         ndrop AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
         f AS (SELECT d.doc_id,
                 CAST(s.n_tokens AS BIGINT) AS n_tokens,
                 (keep.doc_id IS NOT NULL) AS k,
                 (ndrop.doc_id IS NULL) AS nd,
                 (s.pred_lang = 'en') AS lg,
                 (s.quality >= 0.55) AS q
               FROM documents d
               LEFT JOIN keep ON keep.doc_id = d.doc_id
               LEFT JOIN ndrop ON ndrop.doc_id = d.doc_id
               JOIN scored s ON s.doc_id = d.doc_id)
         SELECT 0 AS stage_ord, 'raw' AS stage, count(*) AS n_docs,
                CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM f
         UNION ALL SELECT 1, 'exact_dedup', count(*) FILTER (WHERE k),
                CAST(coalesce(sum(n_tokens) FILTER (WHERE k), 0) AS BIGINT) FROM f
         UNION ALL SELECT 2, 'near_dedup', count(*) FILTER (WHERE k AND nd),
                CAST(coalesce(sum(n_tokens) FILTER (WHERE k AND nd), 0) AS BIGINT) FROM f
         UNION ALL SELECT 3, 'lang', count(*) FILTER (WHERE k AND nd AND lg),
                CAST(coalesce(sum(n_tokens) FILTER (WHERE k AND nd AND lg), 0) AS BIGINT) FROM f
         UNION ALL SELECT 4, 'quality', count(*) FILTER (WHERE k AND nd AND lg AND q),
                CAST(coalesce(sum(n_tokens) FILTER (WHERE k AND nd AND lg AND q), 0) AS BIGINT) FROM f""",

    "text_top_bigrams" -> s"""WITH $tok,
         bg AS (SELECT doc_id, unnest(
                  CASE WHEN len(tk) >= 2
                       THEN list_transform(generate_series(1, len(tk)-1),
                                           i -> array_to_string(tk[i:i+1], ' '))
                       ELSE []::VARCHAR[] END) AS bigram FROM tok)
         SELECT bigram, count(*) AS occurrences, count(DISTINCT doc_id) AS doc_freq
         FROM bg GROUP BY 1
         ORDER BY occurrences DESC, bigram LIMIT 20""",

    // identical pattern literals via TextAnalysis.piiPatterns; RE2 and
    // Java regex agree on this syntax subset (classes + quantifiers)
    "text_pii_scrub" -> {
      import graft.operators.TextAnalysis.piiPatterns
      val counts = piiPatterns.map { case (name, pat) =>
        s"len(regexp_extract_all(text, '$pat')) AS n_$name"
      }.mkString(", ")
      val redacted = piiPatterns.foldLeft("text") { case (c, (name, pat)) =>
        s"regexp_replace($c, '$pat', '<${name.toUpperCase}>', 'g')"
      }
      s"SELECT doc_id, $counts, md5($redacted) AS redacted_hash FROM documents"
    },

    // same integer counts as TextAnalysis.repetition's sorted-run passes,
    // derived here by explode + groupBy (implementation-independent)
    "text_repetition" -> s"""WITH $tok,
         base AS (SELECT doc_id, tk, len(tk) AS n, length(text) AS nchars FROM tok),
         bg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
                  THEN list_transform(generate_series(1, len(tk)-1),
                                      i -> array_to_string(tk[i:i+1], ' '))
                  ELSE []::VARCHAR[] END) AS g FROM tok),
         tg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
                  THEN list_transform(generate_series(1, len(tk)-2),
                                      i -> array_to_string(tk[i:i+2], ' '))
                  ELSE []::VARCHAR[] END) AS g FROM tok),
         bgc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY 1, 2),
         top2 AS (SELECT doc_id, max(cnt * length(g)) AS mass FROM bgc GROUP BY 1),
         tgc AS (SELECT doc_id, g, count(*) AS cnt FROM tg GROUP BY 1, 2),
         dup3 AS (SELECT doc_id, sum(cnt) FILTER (WHERE cnt >= 2) AS dup,
                         sum(cnt) AS tot FROM tgc GROUP BY 1),
         tks AS (SELECT doc_id, pos, tk[pos] AS tok FROM
                 (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, tk FROM tok)),
         brk AS (SELECT doc_id, pos, tok,
                 CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) = tok
                      THEN 0 ELSE 1 END AS b FROM tks),
         isl AS (SELECT doc_id, sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM brk),
         rl AS (SELECT doc_id, island, count(*) AS rl FROM isl GROUP BY 1, 2),
         mr AS (SELECT doc_id, max(rl) AS max_run FROM rl GROUP BY 1)
         SELECT base.doc_id, base.n AS n_tokens,
                floor((len(list_distinct(base.tk)) * 1.0 / base.n) * 10000.0 + 0.5) / 10000.0 AS ttr,
                floor((coalesce(top2.mass, 0) * 1.0 / base.nchars) * 10000.0 + 0.5) / 10000.0 AS top2_char_frac,
                CASE WHEN coalesce(dup3.tot, 0) > 0
                     THEN floor((coalesce(dup3.dup, 0) * 1.0 / dup3.tot) * 10000.0 + 0.5) / 10000.0
                     ELSE 0.0 END AS dup3_frac,
                mr.max_run
         FROM base
         LEFT JOIN top2 USING (doc_id)
         LEFT JOIN dup3 USING (doc_id)
         LEFT JOIN mr USING (doc_id)""",

    "text_fingerprint" -> s"""WITH $tok
         SELECT doc_id,
                list_reduce(list_prepend(0, list_transform(tk,
                    x -> CAST(${h60("x")} % 1000003 AS BIGINT))),
                  (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
         FROM tok""",

    "mm_audio_chunks" -> s"""WITH h AS (
           SELECT doc_id, md5(text) AS content_hash, ${h60("text")} AS hm FROM documents),
         m AS (SELECT doc_id, content_hash,
                      CAST(CASE WHEN hm % 3 = 0 THEN 16000
                                WHEN hm % 3 = 1 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
                      CAST(1 + (hm // 8) % 120 AS INT) AS duration_s FROM h),
         ch AS (SELECT doc_id, content_hash, sample_rate, duration_s,
                       unnest(generate_series(0, duration_s - 1, 10)) AS chunk_start_s FROM m)
         SELECT doc_id, sample_rate, duration_s,
                CAST(chunk_start_s AS INT) AS chunk_start_s,
                CAST(least(chunk_start_s + 10, duration_s) AS INT) AS chunk_end_s,
                CAST(${h60("content_hash || '_c' || chunk_start_s")} AS BIGINT) AS chunk_hash
         FROM ch""",

    "mm_frame_sample" -> s"""WITH h AS (
           SELECT doc_id, md5(text) AS content_hash,
                  CAST(1 + ${h60("text")} % 8 AS INT) AS n_frames FROM documents),
         fr AS (SELECT doc_id, content_hash,
                       unnest(generate_series(0, n_frames - 1, 2)) AS frame_idx FROM h)
         SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
                CAST(${h60("content_hash || '_f' || frame_idx")} AS BIGINT) AS frame_hash
         FROM fr""",

    "mm_scene_detect" -> s"""WITH h AS (
           SELECT doc_id, md5(text) AS content_hash,
                  CAST(1 + ${h60("text")} % 8 AS INT) AS n_frames FROM documents),
         fr AS (SELECT doc_id, content_hash,
                       unnest(generate_series(0, n_frames - 1)) AS frame_idx FROM h),
         fh AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
                       CAST(${h60("content_hash || '_f' || frame_idx")} AS BIGINT) AS frame_hash
                FROM fr),
         lg AS (SELECT doc_id, frame_idx, frame_hash,
                       lag(frame_hash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_hash
                FROM fh),
         d AS (SELECT doc_id, frame_idx,
                      CASE WHEN prev_hash IS NULL THEN NULL
                           ELSE CAST(bit_count(xor(frame_hash, prev_hash)) AS BIGINT) END AS dist,
                      (prev_hash IS NULL OR
                       bit_count(xor(frame_hash, prev_hash)) > 25) AS is_boundary
               FROM lg)
         SELECT doc_id, frame_idx, dist, is_boundary,
                CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT) AS scene_id
         FROM d""",

    // keyframes: min frame per scene + shot length over the scene CTEs
    "mm_keyframes" -> s"""WITH h AS (
           SELECT doc_id, md5(text) AS content_hash,
                  CAST(1 + ${h60("text")} % 8 AS INT) AS n_frames FROM documents),
         fr AS (SELECT doc_id, content_hash,
                       unnest(generate_series(0, n_frames - 1)) AS frame_idx FROM h),
         fh AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
                       CAST(${h60("content_hash || '_f' || frame_idx")} AS BIGINT) AS frame_hash
                FROM fr),
         lg AS (SELECT doc_id, frame_idx, frame_hash,
                       lag(frame_hash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_hash
                FROM fh),
         d AS (SELECT doc_id, frame_idx,
                      (prev_hash IS NULL OR
                       bit_count(xor(frame_hash, prev_hash)) > 25) AS is_boundary
               FROM lg),
         sc AS (SELECT doc_id, frame_idx,
                       CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT) AS scene_id
                FROM d)
         SELECT doc_id, scene_id, min(frame_idx) AS keyframe_idx,
                count(*) AS scene_len
         FROM sc GROUP BY 1, 2""",

    // full k-means training loop replayed: hash-chosen seeds, 2 Lloyd
    // iterations with fixed-point centroid means, probe-2 search
    "ann_kmeans_topk" -> s"""WITH $nrm,
         sd AS (SELECT vec_id, embedding, ${h60("CAST(vec_id AS VARCHAR)")} AS hv
                FROM embeddings),
         seeds AS (SELECT vec_id, embedding, hv,
                   row_number() OVER (ORDER BY hv, vec_id) AS cid
                   FROM sd QUALIFY cid <= 8),
         c0 AS (SELECT s.cid, s.embedding AS cvec, n.nrm AS cnrm
                FROM seeds s JOIN nrm n ON n.vec_id = s.vec_id),
         ${kmeansIterSql(1, "c0")},
         ${kmeansIterSql(2, "c1")},
         ${ivfTail("c2")}""",

    // k-means|| oversampled seeding + 3 unrolled Lloyd rounds. The Spark
    // side may stop earlier on a stable assignment — updateCentroids is a
    // fixpoint there, so the extra unrolled rounds are no-ops and results
    // agree.
    "ann_kmeanspp_topk" -> s"""WITH $nrm,
         ${kparSeedSql(8, 8, 2)},
         ${kmeansIterSql(1, "s8")},
         ${kmeansIterSql(2, "c1")},
         ${kmeansIterSql(3, "c2")},
         ${ivfTail("c3")}""",

    "mm_binary_meta" -> s"""WITH h AS (
           SELECT doc_id, text, CAST(${h60("text")} AS BIGINT) AS hm FROM documents)
         SELECT doc_id, octet_length(text::BLOB) AS byte_len, md5(text) AS content_hash,
                CAST(64 + hm % 512 AS INT) AS width,
                CAST(64 + (hm // 512) % 512 AS INT) AS height,
                CAST(1 + hm % 8 AS INT) AS n_frames
         FROM h""",

    // aspect ladder replicated as a VALUES join; same argmin
    // (dist, idx) tie-break and 1e-4-grid crop mean
    "mm_aspect_bucket" -> s"""WITH h AS (
           SELECT doc_id, CAST(${h60("text")} AS BIGINT) AS hm FROM documents),
         m AS (SELECT doc_id,
                      CAST(CAST(64 + hm % 512 AS INT) AS DOUBLE)
                        / CAST(64 + (hm // 512) % 512 AS INT) AS r
               FROM h),
         lad(idx, bucket, t) AS (VALUES
           (0, 'square', 1.0 / 1.0), (1, 'landscape_4_3', 4.0 / 3.0),
           (2, 'portrait_3_4', 3.0 / 4.0), (3, 'wide_16_9', 16.0 / 9.0),
           (4, 'tall_9_16', 9.0 / 16.0)),
         e AS (SELECT doc_id, r, idx, bucket, t, abs(r - t) AS dist
               FROM m CROSS JOIN lad),
         pick AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY dist, idx) AS rn FROM e)
         SELECT bucket, count(*) AS n_images,
                floor(CAST(sum(CAST(floor((1.0 - least(r / t, t / r))
                                          * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 10000.0 / count(*) * 10000.0 + 0.5) / 10000.0 AS mean_crop
         FROM pick WHERE rn = 1 GROUP BY 1""",

    "mm_feature_extract" -> s"""
         SELECT doc_id, i AS feature_idx,
                CAST(CAST((CAST(('0x' || substr(md5(text), i * 4 + 1, 4))::UBIGINT % 2000
                                AS BIGINT) - 1000)
                          / 1000.0 AS REAL) AS DOUBLE) AS feature_val
         FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) g""",

    "sample_weighted" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         q AS (SELECT doc_id,
                floor((least(1.0, n_tokens / 100.0) * 0.4
                      + (1.0 - punct * 1.0 / nchars) * 0.3
                      + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
               FROM t2)
         SELECT d.doc_id, d.lang, d.source, q.quality
         FROM documents d JOIN q USING (doc_id)
         WHERE ${h60("CAST(doc_id AS VARCHAR) || 'w1'")} % 10000 < q.quality * 10000.0""",

    "text_tfidf_top_terms" ->
      """WITH tkx AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tkx WHERE length(term) > 0 GROUP BY 1, 2),
         dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         s AS (SELECT tf.doc_id, tf.term, tf.tf, dfs.df,
                 floor(((tf.tf * n.n_docs) * 1.0 / dfs.df) * 10000.0 + 0.5) / 10000.0 AS score
               FROM tf JOIN dfs USING (term) CROSS JOIN n),
         r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM s)
         SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3""",

    "text_dup_span_coverage" -> s"""WITH $tok,
         pos AS (SELECT doc_id, CAST(${h60("sg")} AS BIGINT) AS g
           FROM (SELECT doc_id, unnest(
             CASE WHEN len(tk) >= 8
                  THEN list_transform(generate_series(1, len(tk)-7),
                                      i -> array_to_string(tk[i:i+7], ' '))
                  ELSE []::VARCHAR[] END) AS sg FROM tok)),
         dfs AS (SELECT g, count(*) AS df
                 FROM (SELECT DISTINCT doc_id, g FROM pos) GROUP BY 1),
         agg AS (SELECT pos.doc_id, count(*) AS n_spans,
                        CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
                 FROM pos JOIN dfs USING (g) GROUP BY 1)
         SELECT d.doc_id, CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
                CAST(coalesce(dup_spans, 0) AS BIGINT) AS dup_spans,
                CASE WHEN coalesce(n_spans, 0) = 0 THEN 0.0
                     ELSE floor((dup_spans * 1.0 / n_spans) * 10000.0 + 0.5) / 10000.0 END AS dup_frac
         FROM documents d LEFT JOIN agg USING (doc_id)""",

    "quality_retention_curve" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         q AS (SELECT n_tokens,
                      floor((least(1.0, n_tokens / 100.0) * 0.4
                            + (1.0 - punct * 1.0 / nchars) * 0.3
                            + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
               FROM t2),
         qq AS (SELECT least(9, CAST(floor(quality * 10) AS INT)) AS b,
                       CAST(n_tokens AS BIGINT) AS nt,
                       CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS q4 FROM q),
         byb AS (SELECT b, count(*) AS nd, sum(nt) AS tok, sum(q4) AS sq4
                 FROM qq GROUP BY 1),
         th AS (SELECT unnest(generate_series(0, 9)) AS tb),
         cum AS (SELECT tb, sum(nd) AS nd, sum(tok) AS tok, sum(sq4) AS sq4
                 FROM th LEFT JOIN byb ON b >= tb GROUP BY 1),
         tot AS (SELECT sum(nd) AS tnd, sum(tok) AS ttok FROM byb)
         SELECT tb / 10.0 AS threshold,
                CAST(coalesce(nd, 0) AS BIGINT) AS n_docs,
                CAST(coalesce(tok, 0) AS BIGINT) AS n_tokens,
                floor((coalesce(nd, 0) * 1.0 / tnd) * 10000.0 + 0.5) / 10000.0 AS frac_docs,
                floor((coalesce(tok, 0) * 1.0 / ttok) * 10000.0 + 0.5) / 10000.0 AS frac_tokens,
                CASE WHEN coalesce(nd, 0) = 0 THEN 0.0
                     ELSE floor((sq4 / 10000.0 / nd) * 10000.0 + 0.5) / 10000.0 END AS mean_quality
         FROM cum CROSS JOIN tot""",

    "text_span_scrub" -> s"""WITH $tok,
         posi AS (SELECT doc_id, tk,
                    unnest(CASE WHEN len(tk) >= 8
                           THEN generate_series(1, len(tk)-7)
                           ELSE []::BIGINT[] END) AS i
                  FROM tok),
         pos AS (SELECT doc_id, i,
                   CAST(${h60("array_to_string(tk[i:i+7], ' ')")} AS BIGINT) AS g
                 FROM posi),
         dfs AS (SELECT g, count(*) AS df, min(doc_id) AS keeper
                 FROM (SELECT DISTINCT doc_id, g FROM pos) GROUP BY 1),
         scr AS (SELECT p.doc_id, p.i FROM pos p JOIN dfs USING (g)
                 WHERE df >= 2 AND p.doc_id <> keeper),
         spc AS (SELECT doc_id, count(*) AS n_spans_removed FROM scr GROUP BY 1),
         cov AS (SELECT doc_id, list_sort(list(DISTINCT j)) AS cl,
                        count(DISTINCT j) AS n_removed
                 FROM (SELECT doc_id, unnest(generate_series(i, i+7)) AS j FROM scr)
                 GROUP BY 1)
         SELECT t.doc_id,
                CASE WHEN cl IS NULL THEN array_to_string(tk, ' ')
                     -- array_to_string([]) is NULL in DuckDB 1.0; a fully
                     -- scrubbed doc must read as '' like Spark's array_join
                     ELSE coalesce(array_to_string(list_transform(
                            list_filter(generate_series(1, len(tk)),
                                        j -> NOT list_contains(cl, j)),
                            j -> tk[j]), ' '), '') END AS scrubbed_text,
                CAST(coalesce(n_removed, 0) AS BIGINT) AS n_tokens_removed,
                CAST(coalesce(n_spans_removed, 0) AS BIGINT) AS n_spans_removed
         FROM tok t LEFT JOIN cov USING (doc_id) LEFT JOIN spc USING (doc_id)""",

    "text_quality_model" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         f AS (SELECT doc_id,
                floor(least(1.0, n_tokens / 100.0) * 10000.0 + 0.5) / 10000.0 AS len_score,
                floor((punct * 1.0 / nchars) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                floor((stops * 1.0 / n_tokens) * 10000.0 + 0.5) / 10000.0 AS stop_ratio
               FROM t2),
         sc AS (SELECT doc_id, len_score, punct_ratio, stop_ratio,
                floor(greatest(0.0, least(1.0,
                      (len_score * 0.9 - punct_ratio * 1.2 + stop_ratio * 0.6 - 0.1) * 0.5 + 0.5))
                      * 10000.0 + 0.5) / 10000.0 AS model_score
               FROM f)
         SELECT doc_id, len_score, punct_ratio, stop_ratio, model_score,
                model_score >= 0.55 AS keep
         FROM sc""",

    "dedup_minhash_estimate" -> {
      val matchSum = (0 until Dedup.NumPerms)
        .map(j => s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""$bandsPrefix,
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bands x JOIN bands y
                   ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
        m AS (SELECT c.doc_a, c.doc_b, ($matchSum) AS matches
              FROM cand c
              JOIN sig a ON a.doc_id = c.doc_a
              JOIN sig b ON b.doc_id = c.doc_b)
        SELECT doc_a, doc_b, matches,
               floor((matches * 1.0 / ${Dedup.NumPerms}) * 10000.0 + 0.5) / 10000.0 AS est_jaccard
        FROM m
        WHERE floor((matches * 1.0 / ${Dedup.NumPerms}) * 10000.0 + 0.5) / 10000.0 >= 0.5"""
    },

    "corpus_length_histogram" ->
      """WITH t AS (SELECT lang, len(regexp_split_to_array(text, '\s+')) AS n_tokens FROM documents),
         b AS (SELECT lang, CAST(floor(log2(n_tokens)) AS INT) AS len_bucket, n_tokens
               FROM t WHERE n_tokens >= 1)
         SELECT lang, len_bucket, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                CAST((1 << len_bucket) AS INT) AS bucket_lo,
                CAST((1 << (len_bucket + 1)) AS INT) AS bucket_hi
         FROM b GROUP BY 1, 2""",

    "ann_pq_topk" -> s"""WITH $nrm,
         $pqCtes
         SELECT query_id, vec_id AS neighbor_id, rnk,
                floor(cos * 10000.0 + 0.5) / 10000.0 AS score
         FROM rk WHERE rnk <= 5""",

    // hyperplane-LSH-blocked test-vs-train cosine — the semantic twin of
    // contamination_check (test set = vec_id < 50, same banding as
    // embedding_dedup)
    "contamination_semantic" -> s"""WITH $nrm, $sigs,
         lb AS (SELECT vec_id, (vec_id < 50) AS is_test FROM embeddings),
         bands AS (SELECT s.vec_id, b.band, (s.sig >> (2 * b.band)) & 3 AS key
                   FROM sigs s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
         cand AS (SELECT DISTINCT x.vec_id AS train_id, y.vec_id AS test_id
                  FROM bands x
                  JOIN lb lx ON lx.vec_id = x.vec_id AND NOT lx.is_test
                  JOIN bands y ON y.band = x.band AND y.key = x.key
                  JOIN lb ly ON ly.vec_id = y.vec_id AND ly.is_test)
         SELECT train_id, test_id,
                floor((${dot64("a.embedding", "b.embedding")} / (na.nrm * nb.nrm)) * 10000.0 + 0.5) / 10000.0 AS cos_sim
         FROM cand
         JOIN embeddings a ON a.vec_id = train_id
         JOIN embeddings b ON b.vec_id = test_id
         JOIN nrm na ON na.vec_id = train_id
         JOIN nrm nb ON nb.vec_id = test_id
         WHERE floor((${dot64("a.embedding", "b.embedding")} / (na.nrm * nb.nrm)) * 10000.0 + 0.5) / 10000.0 >= 0.4""",

    "ann_ivfpq_topk" -> s"""WITH $nrm,
         $ivfpqCtes
         SELECT query_id, vec_id AS neighbor_id, rnk,
                floor(cos * 10000.0 + 0.5) / 10000.0 AS score
         FROM rk WHERE rnk <= 5""",

    // per-decile recall of the LSH candidate stage vs the df-capped
    // exact pair set (ngram_jaccard's join) — LSH-found pairs = exact
    // pairs restricted to band candidates, so the curve is a histogram
    // ratio
    "dedup_blocking_recall" -> s"""$bandsPrefix,
         rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 50),
         shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
         epr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                 FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         exact AS (SELECT doc_a, doc_b,
                          floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
                   FROM epr JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
                   WHERE floor((inter / (sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 >= 0.2),
         cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         lsh AS (SELECT e.* FROM exact e JOIN cand USING (doc_a, doc_b)),
         tb AS (SELECT floor(jaccard * 10.0) / 10.0 AS j_bucket, count(*) AS nb FROM exact GROUP BY 1),
         fb AS (SELECT floor(jaccard * 10.0) / 10.0 AS j_bucket, count(*) AS nb FROM lsh GROUP BY 1)
         SELECT tb.j_bucket,
                CAST(sum(tb.nb) OVER w AS BIGINT) AS n_true,
                CAST(sum(coalesce(fb.nb, 0)) OVER w AS BIGINT) AS n_found,
                floor((sum(coalesce(fb.nb, 0)) OVER w / sum(tb.nb) OVER w) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM tb LEFT JOIN fb USING (j_bucket)
         WINDOW w AS (ORDER BY tb.j_bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    "ann_recall_ivfpq" -> s"""WITH $nrm,
         $ivfpqCtes,
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         ap AS (SELECT query_id, vec_id AS neighbor_id FROM rk WHERE rnk <= 5),
         fnd AS (SELECT query_id, count(*) AS n_found FROM ap GROUP BY 1),
         ht AS (SELECT query_id, count(*) AS n_hits
                FROM bf JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         SELECT bf.query_id, count(*) AS n_true,
                CAST(coalesce(max(fnd.n_found), 0) AS BIGINT) AS n_found,
                CAST(coalesce(max(ht.n_hits), 0) AS BIGINT) AS n_hits,
                floor((coalesce(max(ht.n_hits), 0) / 5.0) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM bf
         LEFT JOIN fnd ON fnd.query_id = bf.query_id
         LEFT JOIN ht ON ht.query_id = bf.query_id
         GROUP BY 1""",

    "mm_image_tiles" -> s"""WITH h AS (
           SELECT doc_id, md5(text) AS content_hash,
                  CAST(${h60("text")} AS BIGINT) AS hm FROM documents),
         m AS (SELECT doc_id, content_hash,
                CAST(64 + hm % 512 AS INT) AS width,
                CAST(64 + (hm // 512) % 512 AS INT) AS height FROM h),
         tx AS (SELECT m.*, unnest(generate_series(0, (width - 1) // 64)) AS tile_x FROM m),
         t AS (SELECT tx.*, unnest(generate_series(0, (height - 1) // 64)) AS tile_y FROM tx)
         SELECT doc_id, CAST(tile_x AS INT) AS tile_x, CAST(tile_y AS INT) AS tile_y,
                CAST(tile_x * 64 AS INT) AS x0,
                CAST(least(tile_x * 64 + 64, width) AS INT) AS x1,
                CAST(tile_y * 64 AS INT) AS y0,
                CAST(least(tile_y * 64 + 64, height) AS INT) AS y1,
                CAST(${h60("content_hash || '_t' || tile_x || '_' || tile_y")} AS BIGINT) AS tile_hash
         FROM t""",

    "mm_tile_dedup" -> s"""WITH du AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 10),
         h AS (
           SELECT doc_id, md5(text) AS content_hash,
                  CAST(${h60("text")} AS BIGINT) AS hm FROM du),
         m AS (SELECT doc_id, content_hash,
                CAST(64 + hm % 512 AS INT) AS width,
                CAST(64 + (hm // 512) % 512 AS INT) AS height FROM h),
         tx AS (SELECT m.*, unnest(generate_series(0, (width - 1) // 64)) AS tile_x FROM m),
         t AS (SELECT tx.*, unnest(generate_series(0, (height - 1) // 64)) AS tile_y FROM tx),
         th AS (SELECT doc_id,
                CAST(${h60("content_hash || '_t' || tile_x || '_' || tile_y")} AS BIGINT) AS tile_hash
                FROM t)
         SELECT tile_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_tiles
         FROM th GROUP BY 1
         HAVING count(DISTINCT doc_id) >= 2""",

    "contamination_bloom" -> s"""WITH $tok,
         sh8 AS (SELECT doc_id, CAST(${h60("sg")} AS BIGINT) AS shingle
           FROM (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(tk) >= 8
                  THEN list_transform(generate_series(1, len(tk)-7),
                                      i -> array_to_string(tk[i:i+7], ' '))
                  ELSE []::VARCHAR[] END)) AS sg FROM tok)),
         lbl AS (SELECT doc_id, shingle, (doc_id < 50) AS is_test FROM sh8),
         tpos AS (SELECT DISTINCT p FROM (
             SELECT shingle % 65536 AS p FROM lbl WHERE is_test
             UNION ALL SELECT (shingle // 65536) % 65536 FROM lbl WHERE is_test) u),
         tr AS (SELECT doc_id, shingle, shingle % 65536 AS p1,
                       (shingle // 65536) % 65536 AS p2 FROM lbl WHERE NOT is_test),
         bh AS (SELECT doc_id, count(*) AS n_grams,
                 CAST(sum(CASE WHEN p1 IN (SELECT p FROM tpos)
                                AND p2 IN (SELECT p FROM tpos) THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits
                FROM tr GROUP BY 1),
         ex AS (SELECT tr.doc_id, count(*) AS exact_hits
                FROM tr JOIN (SELECT DISTINCT shingle FROM lbl WHERE is_test) te USING (shingle)
                GROUP BY 1)
         SELECT bh.doc_id, n_grams, bloom_hits,
                CAST(coalesce(exact_hits, 0) AS BIGINT) AS exact_hits,
                CAST(bloom_hits - coalesce(exact_hits, 0) AS BIGINT) AS false_pos
         FROM bh LEFT JOIN ex USING (doc_id)
         WHERE bloom_hits > 0""",

    "mm_resize" -> s"""WITH h AS (
           SELECT doc_id, CAST(${h60("text")} AS BIGINT) AS hm FROM documents),
         m AS (SELECT doc_id,
                CAST(64 + hm % 512 AS INT) AS width,
                CAST(64 + (hm // 512) % 512 AS INT) AS height FROM h)
         SELECT doc_id, width, height,
                CAST(floor(width * least(128.0 / width, 128.0 / height, 1.0)) AS INT) AS out_w,
                CAST(floor(height * least(128.0 / width, 128.0 / height, 1.0)) AS INT) AS out_h
         FROM m""",

    "data_split" -> s"""
         SELECT doc_id, lang, source,
                CASE WHEN ${h60("CAST(doc_id AS VARCHAR) || 's1'")} % 100 < 90 THEN 'train'
                     WHEN ${h60("CAST(doc_id AS VARCHAR) || 's1'")} % 100 < 95 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents""",

    "data_shuffle_shards" -> s"""
         WITH h AS (SELECT doc_id,
                CAST(${h60("CAST(doc_id AS VARCHAR) || 'sh1'")} AS BIGINT) AS shuffle_key
              FROM documents),
         r AS (SELECT doc_id, shuffle_key,
                row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS p FROM h)
         SELECT doc_id, shuffle_key,
                CAST(p % 8 AS BIGINT) AS shard,
                CAST(p // 8 AS BIGINT) AS pos_in_shard
         FROM r""",

    "sample_token_budget" -> s"""
         WITH t1 AS (SELECT doc_id, source,
                CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
                CAST(${h60("CAST(doc_id AS VARCHAR) || 'tb1'")} AS BIGINT) AS pick
              FROM documents),
         w AS (SELECT doc_id, source, n_tokens,
                CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY pick, doc_id)
                     AS BIGINT) AS cum_tokens
              FROM t1)
         SELECT doc_id, source, n_tokens, cum_tokens FROM w WHERE cum_tokens <= 800""",

    "text_token_entropy" -> """
         WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
                     FROM documents),
         c AS (SELECT doc_id, tok, count(*) AS cnt FROM tk GROUP BY 1, 2),
         n AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                      CAST(count(*) AS BIGINT) AS n_types
               FROM c GROUP BY 1),
         e AS (SELECT c.doc_id,
                CAST(sum(cnt * CAST(floor(ln(cnt / n.n_tokens::DOUBLE) * 1000000.0 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS s
               FROM c JOIN n ON n.doc_id = c.doc_id GROUP BY 1)
         SELECT n.doc_id, n.n_tokens, n.n_types,
                floor((-s / (n.n_tokens * 1000000.0)) * 10000.0 + 0.5) / 10000.0 AS entropy
         FROM n JOIN e ON e.doc_id = n.doc_id""",

    "ann_recall_eval" -> s"""WITH $nrm, $sigs,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         lq AS (SELECT q.query_id, q.qv, s.sig FROM q JOIN sigs s ON s.vec_id = q.query_id),
         lsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM lq
                 JOIN sigs cs ON cs.sig = lq.sig
                 JOIN embeddings c ON c.vec_id = cs.vec_id AND c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         ap AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM lsc) WHERE rnk <= 5),
         fnd AS (SELECT query_id, count(*) AS n_found FROM ap GROUP BY 1),
         ht AS (SELECT query_id, count(*) AS n_hits
                FROM bf JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         SELECT bf.query_id, count(*) AS n_true,
                CAST(coalesce(max(fnd.n_found), 0) AS BIGINT) AS n_found,
                CAST(coalesce(max(ht.n_hits), 0) AS BIGINT) AS n_hits,
                floor((coalesce(max(ht.n_hits), 0) / 5.0) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM bf
         LEFT JOIN fnd ON fnd.query_id = bf.query_id
         LEFT JOIN ht ON ht.query_id = bf.query_id
         GROUP BY 1""",

    "ann_recall_multiprobe" -> s"""WITH $nrm, $sigs,
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         lq AS (SELECT q.query_id, q.qv, s.sig FROM q JOIN sigs s ON s.vec_id = q.query_id),
         qp AS (SELECT query_id, qv,
                       CASE WHEN g.p = -1 THEN sig
                            ELSE xor(sig, CAST(1 AS BIGINT) << g.p) END AS probe
                FROM lq CROSS JOIN (SELECT unnest(generate_series(-1, ${Similarity.NumPlanes - 1})) AS p) g),
         msc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM qp
                 JOIN sigs cs ON cs.sig = qp.probe
                 JOIN embeddings c ON c.vec_id = cs.vec_id AND c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         ap AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM msc) WHERE rnk <= 5),
         fnd AS (SELECT query_id, count(*) AS n_found FROM ap GROUP BY 1),
         ht AS (SELECT query_id, count(*) AS n_hits
                FROM bf JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         SELECT bf.query_id, count(*) AS n_true,
                CAST(coalesce(max(fnd.n_found), 0) AS BIGINT) AS n_found,
                CAST(coalesce(max(ht.n_hits), 0) AS BIGINT) AS n_hits,
                floor((coalesce(max(ht.n_hits), 0) / 5.0) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM bf
         LEFT JOIN fnd ON fnd.query_id = bf.query_id
         LEFT JOIN ht ON ht.query_id = bf.query_id
         GROUP BY 1""",

    "ann_recall_pq" -> s"""WITH $nrm,
         $pqCtes,
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         ap AS (SELECT query_id, vec_id AS neighbor_id FROM rk WHERE rnk <= 5),
         fnd AS (SELECT query_id, count(*) AS n_found FROM ap GROUP BY 1),
         ht AS (SELECT query_id, count(*) AS n_hits
                FROM bf JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         SELECT bf.query_id, count(*) AS n_true,
                CAST(coalesce(max(fnd.n_found), 0) AS BIGINT) AS n_found,
                CAST(coalesce(max(ht.n_hits), 0) AS BIGINT) AS n_hits,
                floor((coalesce(max(ht.n_hits), 0) / 5.0) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM bf
         LEFT JOIN fnd ON fnd.query_id = bf.query_id
         LEFT JOIN ht ON ht.query_id = bf.query_id
         GROUP BY 1""",

    "ann_recall_ivf" -> s"""WITH $nrm,
         flat AS (SELECT label, i.pos, embedding[i.pos]::DOUBLE AS v
                  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         cent AS (SELECT label, pos,
                         CAST(sum(CAST(floor(v * 10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                           / 10000000.0 / count(*) AS cv
                  FROM flat GROUP BY 1, 2),
         cvecs AS (SELECT label, list(CAST(cv AS REAL) ORDER BY pos) AS cvec FROM cent GROUP BY 1),
         cn AS (SELECT label, cvec, sqrt(${dot64("cvec", "cvec")}) AS cnrm FROM cvecs),
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         pr AS (SELECT query_id, cn.label,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY ${dot64("qv", "cvec")} / (nq.nrm * cn.cnrm) DESC, cn.label) AS crnk
                FROM q JOIN nrm nq ON nq.vec_id = query_id CROSS JOIN cn),
         probes AS (SELECT query_id, label FROM pr WHERE crnk <= 2),
         isc AS (SELECT p.query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM probes p JOIN q ON q.query_id = p.query_id
                 JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
                 JOIN nrm nq ON nq.vec_id = p.query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         ap AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM isc) WHERE rnk <= 5),
         fnd AS (SELECT query_id, count(*) AS n_found FROM ap GROUP BY 1),
         ht AS (SELECT query_id, count(*) AS n_hits
                FROM bf JOIN ap USING (query_id, neighbor_id) GROUP BY 1)
         SELECT bf.query_id, count(*) AS n_true,
                CAST(coalesce(max(fnd.n_found), 0) AS BIGINT) AS n_found,
                CAST(coalesce(max(ht.n_hits), 0) AS BIGINT) AS n_hits,
                floor((coalesce(max(ht.n_hits), 0) / 5.0) * 10000.0 + 0.5) / 10000.0 AS recall
         FROM bf
         LEFT JOIN fnd ON fnd.query_id = bf.query_id
         LEFT JOIN ht ON ht.query_id = bf.query_id
         GROUP BY 1""",

    // the ann_recall_ivf chain, with the probe ranking evaluated at each
    // probe level and a one-row summary per level
    "ann_tuning_curve" -> {
      def level(p: Int) =
        s"""isc$p AS (SELECT p.query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM (SELECT query_id, label FROM pr WHERE crnk <= $p) p
                 JOIN q ON q.query_id = p.query_id
                 JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
                 JOIN nrm nq ON nq.vec_id = p.query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         ap$p AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM isc$p) WHERE rnk <= 5)"""
      def row(p: Int) =
        s"""SELECT $p AS n_probe,
                (SELECT CAST(count(*) AS BIGINT) FROM bf) AS n_true_total,
                (SELECT CAST(count(*) AS BIGINT)
                 FROM bf JOIN ap$p USING (query_id, neighbor_id)) AS n_hits,
                floor((SELECT count(*) FROM bf JOIN ap$p USING (query_id, neighbor_id))
                      / (SELECT count(*) FROM bf) * 10000.0 + 0.5) / 10000.0 AS mean_recall"""
      s"""WITH $nrm,
         flat AS (SELECT label, i.pos, embedding[i.pos]::DOUBLE AS v
                  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         cent AS (SELECT label, pos,
                         CAST(sum(CAST(floor(v * 10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                           / 10000000.0 / count(*) AS cv
                  FROM flat GROUP BY 1, 2),
         cvecs AS (SELECT label, list(CAST(cv AS REAL) ORDER BY pos) AS cvec FROM cent GROUP BY 1),
         cn AS (SELECT label, cvec, sqrt(${dot64("cvec", "cvec")}) AS cnrm FROM cvecs),
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         bsc AS (SELECT query_id, c.vec_id AS neighbor_id,
                        ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                 FROM q JOIN embeddings c ON c.vec_id <> query_id
                 JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = c.vec_id),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
                  FROM bsc) WHERE rnk <= 5),
         pr AS (SELECT query_id, cn.label,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY ${dot64("qv", "cvec")} / (nq.nrm * cn.cnrm) DESC, cn.label) AS crnk
                FROM q JOIN nrm nq ON nq.vec_id = query_id CROSS JOIN cn),
         ${level(1)},
         ${level(2)},
         ${level(3)}
         ${row(1)} UNION ALL ${row(2)} UNION ALL ${row(3)}"""
    },

    "seq_packing" -> """WITH t1 AS (
           SELECT doc_id, lang,
                  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         w AS (SELECT doc_id, lang, n_tokens,
                      CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS end_off
               FROM t1)
         SELECT doc_id, lang, n_tokens,
                end_off - n_tokens AS start_off,
                (end_off - n_tokens) // 256 AS first_seq,
                (end_off - 1) // 256 AS last_seq,
                ((end_off - 1) // 256) - ((end_off - n_tokens) // 256) + 1 AS n_seqs
         FROM w""",

    "sample_mixture_apply" -> s"""
         WITH t1 AS (SELECT source, len(regexp_split_to_array(text, '\\s+')) AS n_tokens
                     FROM documents),
         per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
                 FROM t1 GROUP BY 1),
         w AS (SELECT source, n_tokens,
                      CAST(sum(n_tokens) OVER () AS BIGINT) AS tot,
                      count(*) OVER () AS k
               FROM per),
         wt AS (SELECT source,
                       floor((tot / (k * n_tokens)) * 10000.0 + 0.5) / 10000.0 AS weight
                FROM w)
         SELECT d.doc_id, d.source, wt.weight,
                CAST(floor(wt.weight) AS BIGINT)
                + CASE WHEN ${h60("CAST(d.doc_id AS VARCHAR) || 'mx1'")} % 10000
                            < CAST(floor(wt.weight * 10000.0 + 0.5) AS BIGINT) % 10000
                       THEN 1 ELSE 0 END AS n_copies
         FROM documents d JOIN wt USING (source)""",

    "domain_mix_weights" -> """WITH t1 AS (
           SELECT source, len(regexp_split_to_array(text, '\s+')) AS n_tokens
           FROM documents),
         per AS (SELECT source, count(*) AS n_docs,
                        CAST(sum(n_tokens) AS BIGINT) AS n_tokens
                 FROM t1 GROUP BY 1),
         w AS (SELECT source, n_docs, n_tokens,
                      CAST(sum(n_tokens) OVER () AS BIGINT) AS tot,
                      count(*) OVER () AS k
               FROM per)
         SELECT source, n_docs, n_tokens,
                floor((n_tokens / tot) * 10000.0 + 0.5) / 10000.0 AS token_share,
                floor((tot / (k * n_tokens)) * 10000.0 + 0.5) / 10000.0 AS weight
         FROM w""",

    "dedup_edit_distance" -> s"""$bandsPrefix,
         cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         pr AS (SELECT doc_a, doc_b,
                       CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
                       CAST(greatest(length(a.text), length(b.text)) AS BIGINT) AS max_len
                FROM cand JOIN documents a ON a.doc_id = cand.doc_a
                JOIN documents b ON b.doc_id = cand.doc_b)
         SELECT doc_a, doc_b, lev, max_len,
                floor((1.0 - lev * 1.0 / max_len) * 10000.0 + 0.5) / 10000.0 AS sim
         FROM pr
         WHERE floor((1.0 - lev * 1.0 / max_len) * 10000.0 + 0.5) / 10000.0 >= 0.5""",

    "ann_multiprobe_topk" -> s"""WITH $nrm, $sigs,
         q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, s.sig
               FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id WHERE e.vec_id < 10),
         qp AS (SELECT query_id, qv,
                       CASE WHEN g.p = -1 THEN sig
                            ELSE xor(sig, CAST(1 AS BIGINT) << g.p) END AS probe
                FROM q CROSS JOIN (SELECT unnest(generate_series(-1, ${Similarity.NumPlanes - 1})) AS p) g),
         sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                       ${dot64("qv", "c.embedding")} / (nq.nrm * nc.nrm) AS cos
                FROM qp
                JOIN sigs cs ON cs.sig = qp.probe
                JOIN embeddings c ON c.vec_id = cs.vec_id AND c.vec_id <> query_id
                JOIN nrm nq ON nq.vec_id = query_id
                JOIN nrm nc ON nc.vec_id = c.vec_id),
         rk AS (SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk,
                       cos FROM sc)
         SELECT query_id, neighbor_id, rnk, floor(cos * 10000.0 + 0.5) / 10000.0 AS score
         FROM rk WHERE rnk <= 5""",

    "embedding_norm_stats" -> s"""
         WITH nr AS (SELECT label,
                floor(sqrt(${dot64("embedding", "embedding")}) * 1000000.0 + 0.5) AS g
              FROM embeddings)
         SELECT label, count(*) AS n_vecs,
                CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
                floor((sum(g) / (count(*) * 1000000.0)) * 10000.0 + 0.5) / 10000.0 AS mean_norm,
                floor(quantile_cont(g / 1000000.0, 0.1) * 10000.0 + 0.5) / 10000.0 AS p10,
                floor(quantile_cont(g / 1000000.0, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
                floor(quantile_cont(g / 1000000.0, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90
         FROM nr GROUP BY 1""",

    // vec_id-parity cohort centroids (fixed-point means) + cosine per label
    "embedding_drift" -> s"""WITH fl AS (
           SELECT label, vec_id % 2 AS cohort, i.pos, embedding[i.pos]::DOUBLE AS v
           FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         cm AS (SELECT label, cohort, pos,
                       CAST(sum(CAST(floor(v * 10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / 10000000.0 / count(*) AS cv,
                       count(*) AS n
                FROM fl GROUP BY 1, 2, 3),
         cl AS (SELECT label, cohort, list(CAST(cv AS REAL) ORDER BY pos) AS cvec,
                       CAST(max(n) AS BIGINT) AS n_vecs
                FROM cm GROUP BY 1, 2)
         SELECT a.label, a.n_vecs AS n_a, b.n_vecs AS n_b,
                floor((${dot64("a.cvec", "b.cvec")} /
                  (sqrt(${dot64("a.cvec", "a.cvec")}) * sqrt(${dot64("b.cvec", "b.cvec")})))
                  * 10000.0 + 0.5) / 10000.0 AS drift_cos
         FROM cl a JOIN cl b ON b.label = a.label AND a.cohort = 0 AND b.cohort = 1""",

    // kmeans replay + per-cluster cohesion aggregation
    "ann_centroid_stats" -> s"""WITH $nrm,
         sd AS (SELECT vec_id, embedding, ${h60("CAST(vec_id AS VARCHAR)")} AS hv
                FROM embeddings),
         seeds AS (SELECT vec_id, embedding, hv,
                   row_number() OVER (ORDER BY hv, vec_id) AS cid
                   FROM sd QUALIFY cid <= 8),
         c0 AS (SELECT s.cid, s.embedding AS cvec, n.nrm AS cnrm
                FROM seeds s JOIN nrm n ON n.vec_id = s.vec_id),
         ${kmeansIterSql(1, "c0")},
         ${kmeansIterSql(2, "c1")},
         af AS (SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) DESC, c.cid) AS r
                FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN c2 c),
         asnf AS (SELECT vec_id, cid FROM af WHERE r = 1),
         st AS (SELECT a.cid,
                       ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) AS cos
                FROM asnf a
                JOIN embeddings e ON e.vec_id = a.vec_id
                JOIN nrm n ON n.vec_id = a.vec_id
                JOIN c2 c ON c.cid = a.cid)
         SELECT cid, count(*) AS n_vectors,
                floor(avg(cos) * 10000.0 + 0.5) / 10000.0 AS avg_cos,
                floor(min(cos) * 10000.0 + 0.5) / 10000.0 AS min_cos
         FROM st GROUP BY 1""",

    // SemDeDup replay: the same hash-seeded 2-round Lloyd training as
    // ann_kmeans_topk, then within-cluster pairs — clusters over the size
    // cap (64) are sub-blocked by LSH band exactly like the Spark side
    "dedup_semantic" -> s"""WITH $nrm, $sigs, $semPairCtes
         SELECT cid, vec_a, vec_b, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
         FROM spairs WHERE cos >= 0.4""",

    // blocked kNN graph: the SAME quantizer-cell + sub-band candidate
    // chain as dedup_semantic, symmetrized and ranked per vector
    "ann_knn_join_blocked" -> s"""WITH $nrm, $sigs, $semPairCtes,
         spr AS (SELECT vec_a, vec_b, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
                 FROM spairs WHERE cos >= 0.4),
         sym AS (SELECT vec_a AS vec_id, vec_b AS neighbor_id, cos FROM spr
                 UNION ALL SELECT vec_b, vec_a, cos FROM spr),
         kr AS (SELECT vec_id, neighbor_id, cos,
                       CAST(row_number() OVER (PARTITION BY vec_id
                         ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
                FROM sym)
         SELECT vec_id, rnk, neighbor_id, cos AS cos_sim
         FROM kr WHERE rnk <= 5""",

    "text_lm_score" -> """WITH tk AS (
           SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         vocab AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab),
         sc AS (SELECT doc_id, tf,
                       CAST(floor(ln(n_total / cnt) * 1000000.0 + 0.5) AS BIGINT) AS nll6
                FROM tf JOIN vocab USING (tok) CROSS JOIN tot)
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                floor(CAST(sum(tf * nll6) AS DOUBLE) / 1000000.0
                      / CAST(sum(tf) AS BIGINT)
                      * 10000.0 + 0.5) / 10000.0 AS avg_nll
         FROM sc GROUP BY 1""",

    // integer char/token sums per source, two correctly-rounded divisions
    "tokenizer_fertility" -> """WITH c AS (
           SELECT source, len(text) AS nc,
                  len(regexp_split_to_array(text, '\s+')) AS nws,
                  len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]')) AS nbpe
           FROM documents)
         SELECT source, count(*) AS n_docs,
                CAST(sum(nc) AS BIGINT) AS n_chars,
                CAST(sum(nws) AS BIGINT) AS n_ws_tokens,
                CAST(sum(nbpe) AS BIGINT) AS n_bpe_tokens,
                floor(sum(nbpe)::DOUBLE / sum(nws) * 10000.0 + 0.5) / 10000.0 AS fertility,
                floor(sum(nbpe) * 100.0 / sum(nc) * 10000.0 + 0.5) / 10000.0 AS bpe_per_100_chars
         FROM c GROUP BY 1""",

    // the minhash_lsh pair replay labeled with each side's source
    "source_overlap_matrix" -> s"""${minhashWith(0.5)},
         lab AS (SELECT least(da.source, db.source) AS source_a,
                        greatest(da.source, db.source) AS source_b
                 FROM pairs p
                 JOIN documents da ON da.doc_id = p.doc_a
                 JOIN documents db ON db.doc_id = p.doc_b)
         SELECT source_a, source_b, count(*) AS n_pairs
         FROM lab GROUP BY 1, 2""",

    // per-ingest-decile first-seen 8-gram types; bucket id is exact
    // integer arithmetic on both engines
    "corpus_ngram_novelty" -> s"""WITH $tok, $sh8,
         nd AS (SELECT max(doc_id) + 1 AS nd FROM documents),
         b AS (SELECT DISTINCT (doc_id * 10) // nd AS bucket, shingle
               FROM sh8 CROSS JOIN nd),
         f AS (SELECT shingle, min(bucket) AS fb FROM b GROUP BY 1)
         SELECT bucket, count(*) AS n_types,
                CAST(sum(CASE WHEN fb = bucket THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
                floor(sum(CASE WHEN fb = bucket THEN 1 ELSE 0 END)::DOUBLE
                        / count(*) * 10000.0 + 0.5) / 10000.0 AS novelty
         FROM b JOIN f USING (shingle) GROUP BY 1""",

    // overlapping token windows: step 48 = 64 - 16, last window short
    "text_chunk_windows" -> """WITH tk AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS tk FROM documents),
         t AS (SELECT doc_id, tk, len(tk) AS len FROM tk),
         s AS (SELECT doc_id, tk, len, unnest(generate_series(1, len, 48)) AS start
               FROM t)
         SELECT doc_id, CAST((start - 1) // 48 AS BIGINT) AS chunk_id, start,
                least(64, len - start + 1) AS n_tokens,
                array_to_string(tk[start:start+63], ' ') AS chunk_text
         FROM s""",

    // Okapi BM25 with grid-snapped ln and per-term 1e-6 integer scores
    "text_bm25_topk" -> s"""WITH $bm25Ctes
         SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT 10""",

    // reciprocal-rank fusion of the bm25 pool and the exact-cosine pool
    "hybrid_rrf_topk" -> s"""WITH $bm25Ctes, $nrm,
         lexk AS (SELECT doc_id, score FROM bm25
                  ORDER BY score DESC, doc_id LIMIT 20),
         lexr AS (SELECT doc_id AS id,
                  row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
                  FROM lexk),
         qv AS (SELECT e.embedding AS qe, n.nrm AS qn
                FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id
                WHERE e.vec_id = 7),
         cosv AS (SELECT e.vec_id,
                  floor(${dot64("e.embedding", "q.qe")} / (n.nrm * q.qn)
                    * 10000.0 + 0.5) / 10000.0 AS cos
                  FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id
                  CROSS JOIN qv q WHERE e.vec_id <> 7),
         semk AS (SELECT vec_id, cos FROM cosv
                  ORDER BY cos DESC, vec_id LIMIT 20),
         semr AS (SELECT vec_id AS id,
                  row_number() OVER (ORDER BY cos DESC, vec_id) AS sem_rank
                  FROM semk),
         f AS (SELECT coalesce(l.id, s.id) AS doc_id, l.lex_rank, s.sem_rank
               FROM lexr l FULL OUTER JOIN semr s ON l.id = s.id)
         SELECT doc_id,
                floor((coalesce(1.0 / (60 + lex_rank), 0.0)
                     + coalesce(1.0 / (60 + sem_rank), 0.0))
                  * 1000000.0 + 0.5) / 1000000.0 AS rrf_score,
                lex_rank, sem_rank
         FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10""",

    // the Jaccard threshold curve's vector-side twin over epairs
    "embedding_threshold_curve" -> s"""WITH $nrm, $sigs, $embPairs,
         bk AS (SELECT floor(cos_sim * 10.0) / 10.0 AS cos_bucket,
                       count(*) AS n_pairs
                FROM epairs GROUP BY 1)
         SELECT cos_bucket, n_pairs,
                CAST(sum(n_pairs) OVER (ORDER BY cos_bucket DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS n_pairs_at_or_above
         FROM bk""",

    // the sample_mixture_apply replay aggregated to per-source token mass
    "mixture_token_share" -> s"""
         WITH t1 AS (SELECT doc_id, source,
                            len(regexp_split_to_array(text, '\\s+')) AS n_tokens
                     FROM documents),
         per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
                 FROM t1 GROUP BY 1),
         w AS (SELECT source, n_tokens,
                      CAST(sum(n_tokens) OVER () AS BIGINT) AS tot,
                      count(*) OVER () AS k
               FROM per),
         wt AS (SELECT source,
                       floor((tot / (k * n_tokens)) * 10000.0 + 0.5) / 10000.0 AS weight
                FROM w),
         rep AS (SELECT t.source, t.n_tokens,
                        CAST(floor(wt.weight) AS BIGINT)
                        + CASE WHEN ${h60("CAST(t.doc_id AS VARCHAR) || 'mx1'")} % 10000
                                    < CAST(floor(wt.weight * 10000.0 + 0.5) AS BIGINT) % 10000
                               THEN 1 ELSE 0 END AS n_copies
                 FROM t1 t JOIN wt USING (source)),
         agg AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                        CAST(sum(n_copies * n_tokens) AS BIGINT) AS mixed_tokens
                 FROM rep GROUP BY 1),
         fin AS (SELECT source, n_tokens, mixed_tokens,
                        CAST(sum(mixed_tokens) OVER () AS BIGINT) AS tot,
                        count(*) OVER () AS k
                 FROM agg)
         SELECT source, n_tokens, mixed_tokens,
                floor((mixed_tokens / tot) * 10000.0 + 0.5) / 10000.0 AS mixed_share,
                floor((1.0 / k) * 10000.0 + 0.5) / 10000.0 AS target_share
         FROM fin""",

    // the dedup_clusters replay + integer-exact hash admission at 1/csize
    "sample_cluster_downweight" -> s"""WITH RECURSIVE ${minhashWith(0.5).stripPrefix("WITH")},
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION SELECT doc_b, doc_a FROM pairs),
          reach(id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
          comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
          csz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1),
          cw AS (SELECT d.doc_id,
                        coalesce(c.cluster_id, d.doc_id) AS cluster_id,
                        coalesce(s.csize, 1) AS csize
                 FROM documents d
                 LEFT JOIN comp c ON c.doc_id = d.doc_id
                 LEFT JOIN csz s ON s.cluster_id = c.cluster_id)
          SELECT doc_id, cluster_id, CAST(csize AS BIGINT) AS csize,
                 floor(1.0 / csize * 10000.0 + 0.5) / 10000.0 AS weight
          FROM cw
          WHERE CAST(${h60("CAST(doc_id AS VARCHAR) || 'cd1'")} % 1000000 AS BIGINT)
                  * csize < 1000000""",

    // the ann_kmeans training replay, then label agreement per cell
    "cluster_label_purity" -> s"""WITH $nrm,
         sd AS (SELECT vec_id, embedding, ${h60("CAST(vec_id AS VARCHAR)")} AS hv
                FROM embeddings),
         seeds AS (SELECT vec_id, embedding, hv,
                   row_number() OVER (ORDER BY hv, vec_id) AS cid
                   FROM sd QUALIFY cid <= 8),
         c0 AS (SELECT s.cid, s.embedding AS cvec, n.nrm AS cnrm
                FROM seeds s JOIN nrm n ON n.vec_id = s.vec_id),
         ${kmeansIterSql(1, "c0")},
         ${kmeansIterSql(2, "c1")},
         af AS (SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY ${dot64("e.embedding", "c.cvec")} / (n.nrm * c.cnrm) DESC, c.cid) AS r
                FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id CROSS JOIN c2 c),
         asnf AS (SELECT vec_id, cid FROM af WHERE r = 1),
         cl AS (SELECT a.cid, e.label, count(*) AS n
                FROM asnf a JOIN embeddings e ON e.vec_id = a.vec_id
                GROUP BY 1, 2),
         tp AS (SELECT cid, n, label,
                row_number() OVER (PARTITION BY cid ORDER BY n DESC, label) AS r
                FROM cl),
         tv AS (SELECT cid, CAST(sum(n) AS BIGINT) AS n_vectors FROM cl GROUP BY 1)
         SELECT t.cid, v.n_vectors, t.label AS top_label, t.n AS top_n,
                floor(t.n::DOUBLE / v.n_vectors * 10000.0 + 0.5) / 10000.0 AS purity
         FROM tp t JOIN tv v ON v.cid = t.cid WHERE t.r = 1""",

    "text_gopher_rules" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       list_sum(list_transform(tk, x -> length(x))) AS sum_tok_chars,
                       len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stop_hits,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_punct
                FROM tok),
         m AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                      floor(sum_tok_chars * 1.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS mean_tok_chars,
                      floor(n_alpha * 1.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS frac_alpha,
                      CAST(stop_hits AS BIGINT) AS stop_hits,
                      floor(n_punct * 1.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS symbol_ratio
               FROM t2)
         SELECT doc_id, n_tokens, mean_tok_chars, frac_alpha, stop_hits, symbol_ratio,
                n_tokens BETWEEN 50 AND 100000 AS flag_word_count,
                mean_tok_chars BETWEEN 3.0 AND 10.0 AS flag_mean_len,
                frac_alpha >= 0.8 AS flag_alpha,
                stop_hits >= 2 AS flag_stops,
                symbol_ratio < 0.1 AS flag_symbol,
                (n_tokens BETWEEN 50 AND 100000) AND (mean_tok_chars BETWEEN 3.0 AND 10.0)
                  AND frac_alpha >= 0.8 AND stop_hits >= 2 AND symbol_ratio < 0.1 AS "pass"
         FROM m""",

    "sample_dsir_weights" -> s"""WITH $tok,
         tkx AS (SELECT doc_id, unnest(tk) AS tok2 FROM tok),
         bc AS (SELECT doc_id, CAST(${h60("tok2")} % 64 AS BIGINT) AS b, count(*) AS c
                FROM tkx GROUP BY 1, 2),
         tq AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         q AS (SELECT doc_id FROM tq
               WHERE floor((least(1.0, n_tokens / 100.0) * 0.4
                     + (1.0 - punct * 1.0 / nchars) * 0.3
                     + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 >= 0.7),
         raw AS (SELECT b, sum(c) AS cr FROM bc GROUP BY 1),
         tgt AS (SELECT b, sum(c) AS ct FROM bc JOIN q USING (doc_id) GROUP BY 1),
         cn AS (SELECT raw.b, cr, coalesce(ct, 0) AS ct
                FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
         tot AS (SELECT sum(ct) AS t, sum(cr) AS r FROM cn),
         lr AS (SELECT b, CAST(floor(ln((ct + 1) / (t + 64)) * 1000000.0 + 0.5)
                             - floor(ln((cr + 1) / (r + 64)) * 1000000.0 + 0.5) AS BIGINT) AS g
                FROM cn CROSS JOIN tot)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                floor(sum(c * g) / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS log_weight,
                floor(sum(c * g) / (sum(c) * 1000000.0) * 10000.0 + 0.5) / 10000.0 AS avg_log_ratio
         FROM bc JOIN lr USING (b)
         GROUP BY 1""",

    "tokenizer_bpe_merges" -> bpeMergesOracle(8),

    "tokenizer_bpe_encode" -> bpeEncodeOracle(8),

    "tokenizer_bpe_pairs" -> s"""WITH $tok,
         tkx AS (SELECT unnest(tk) AS tok2 FROM tok),
         vocab AS (SELECT tok2, count(*) AS cnt FROM tkx
                   WHERE length(tok2) >= 2 GROUP BY 1),
         pr AS (SELECT unnest(list_transform(generate_series(1, length(tok2) - 1),
                                             i -> substr(tok2, i, 2))) AS pair,
                       tok2, cnt
                FROM vocab)
         SELECT pair, CAST(sum(cnt) AS BIGINT) AS occurrences,
                CAST(count(DISTINCT tok2) AS BIGINT) AS n_types
         FROM pr GROUP BY 1
         ORDER BY occurrences DESC, pair
         LIMIT 20""",

    "curriculum_stages" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops
                FROM tok),
         f AS (SELECT doc_id, n_tokens,
                floor(least(1.0, n_tokens / 100.0) * 10000.0 + 0.5) / 10000.0 AS len_score,
                floor((punct * 1.0 / nchars) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                floor((stops * 1.0 / n_tokens) * 10000.0 + 0.5) / 10000.0 AS stop_ratio
               FROM t2),
         sc AS (SELECT doc_id, n_tokens,
                floor(greatest(0.0, least(1.0,
                      (len_score * 0.9 - punct_ratio * 1.2 + stop_ratio * 0.6 - 0.1) * 0.5 + 0.5))
                      * 10000.0 + 0.5) / 10000.0 AS model_score
               FROM f),
         r AS (SELECT doc_id, model_score, n_tokens,
                      row_number() OVER (ORDER BY model_score DESC, doc_id) AS rnk,
                      count(*) OVER () AS n_all
               FROM sc)
         SELECT CAST(((rnk - 1) * 4) // n_all AS BIGINT) AS stage,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                min(model_score) AS min_score, max(model_score) AS max_score
         FROM r GROUP BY 1""",

    "data_kfold_grouped" -> s"""WITH RECURSIVE ${minhashWith(0.5).stripPrefix("WITH")},
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION SELECT doc_b, doc_a FROM pairs),
          reach(id, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
          comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
          gw AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_id
                 FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
          SELECT doc_id, group_id,
                 CAST(${h60("CAST(group_id AS VARCHAR) || 'kf1'")} % 5 AS BIGINT) AS fold
          FROM gw""",

    "embedding_dim_stats" -> """WITH
         flat AS (SELECT i.pos AS dim,
                         CAST(floor(embedding[i.pos]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS g
                  FROM embeddings
                  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         agg AS (SELECT dim, count(*) AS n, sum(g) AS sg, sum(g * g) AS sg2
                 FROM flat GROUP BY 1),
         m AS (SELECT dim, CAST(n AS BIGINT) AS n,
                      floor(sg / (n * 1000000.0) * 10000.0 + 0.5) / 10000.0 AS mean_v,
                      floor((sg2 / (n * 1000000000000.0)
                             - (sg / (n * 1000000.0)) * (sg / (n * 1000000.0)))
                            * 10000.0 + 0.5) / 10000.0 AS var_v
               FROM agg)
         SELECT dim, n, mean_v, var_v,
                CAST(row_number() OVER (ORDER BY var_v DESC, dim) AS BIGINT) AS var_rank
         FROM m""",

    // one power-iteration round replayed verbatim: snap → center → dot
    // (1e-9 grid) → weighted per-dim sum (1e-6 grid) → driver-order fold
    "embedding_pca_power" -> s"""WITH $pcaCtes
         SELECT dim, floor(u / nrm * 1000000.0 + 0.5) / 1000000.0 AS loading,
                floor(nrm * 10000.0 + 0.5) / 10000.0 AS eigenvalue
         FROM uv CROSS JOIN nr""",

    "embedding_pca_histogram" -> s"""WITH $pcaCtes,
         ld AS (SELECT dim, floor(u / nrm * 1000000.0 + 0.5) / 1000000.0 AS lv
                FROM uv CROSS JOIN nr),
         pj AS (SELECT vec_id,
                       sum(CAST(floor(ctr.cv * ld.lv * 1000000000.0 + 0.5) AS BIGINT)) AS dq
                FROM ctr JOIN ld USING (dim) GROUP BY 1),
         bn AS (SELECT CAST(floor((dq / 1000000000.0) / 0.5) AS BIGINT) AS bin FROM pj)
         SELECT bin, CAST(count(*) AS BIGINT) AS n_vecs,
                floor(bin * 0.5 * 10000.0 + 0.5) / 10000.0 AS bin_lo
         FROM bn GROUP BY 1""",

    "embedding_outliers" -> """WITH
         flat AS (SELECT vec_id, i.pos AS dim,
                         CAST(floor(embedding[i.pos]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS g
                  FROM embeddings
                  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i),
         mn AS (SELECT dim, count(*) AS n, sum(g) AS sg, sum(g * g) AS sg2
                FROM flat GROUP BY 1),
         st AS (SELECT dim, sg / (n * 1000000.0) AS m,
                       sg2 / (n * 1000000000000.0)
                         - (sg / (n * 1000000.0)) * (sg / (n * 1000000.0)) AS va
                FROM mn),
         sp AS (SELECT dim, m, va FROM st WHERE va > 0.000000001),
         sc AS (SELECT vec_id,
                       sum(CAST(floor((g / 1000000.0 - m) * (g / 1000000.0 - m) / va
                                      * 1000000.0 + 0.5) AS BIGINT)) AS sq
                FROM flat JOIN sp USING (dim) GROUP BY 1)
         SELECT vec_id, floor(sq / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS score
         FROM sc
         ORDER BY score DESC, vec_id
         LIMIT 20""",

    "packing_efficiency" -> s"""WITH $tok,
         nt AS (SELECT CAST(len(tk) AS BIGINT) AS n FROM tok),
         e AS (SELECT n, unnest([128, 256, 512, 1024]) AS ctx FROM nt)
         SELECT ctx, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n) AS BIGINT) AS total_tokens,
                CAST(sum(((n + ctx - 1) // ctx) * ctx) AS BIGINT) AS padded_tokens,
                CAST(sum((n + ctx - 1) // ctx) AS BIGINT) AS n_seqs_padded,
                CAST((sum(n) + ctx - 1) // ctx AS BIGINT) AS n_seqs_packed,
                floor((1.0 - sum(n) / sum(((n + ctx - 1) // ctx) * ctx))
                      * 10000.0 + 0.5) / 10000.0 AS pad_waste
         FROM e GROUP BY ctx""",

    "corpus_zipf_slope" -> s"""WITH $tok,
         tkx AS (SELECT unnest(tk) AS tok2 FROM tok),
         vocab AS (SELECT tok2, count(*) AS cnt FROM tkx
                   WHERE tok2 <> '' GROUP BY 1),
         top AS (SELECT tok2, cnt FROM vocab ORDER BY cnt DESC, tok2 LIMIT 100),
         pts AS (SELECT CAST(floor(ln(row_number() OVER (ORDER BY cnt DESC, tok2)::DOUBLE)
                                   * 1000000.0 + 0.5) AS BIGINT) AS gx,
                        CAST(floor(ln(cnt::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS gy
                 FROM top),
         ag AS (SELECT count(*) AS n_points, sum(gx) AS sx, sum(gy) AS sy,
                       sum(gx * gy) AS sxy, sum(gx * gx) AS sxx
                FROM pts)
         SELECT CAST(n_points AS BIGINT) AS n_points,
                floor(CAST(n_points * sxy - sx * sy AS DOUBLE)
                      / CAST(n_points * sxx - sx * sx AS DOUBLE)
                      * 10000.0 + 0.5) / 10000.0 AS slope,
                floor((sy - CAST(n_points * sxy - sx * sy AS DOUBLE)
                            / CAST(n_points * sxx - sx * sx AS DOUBLE) * sx)
                      / (n_points * 1000000.0) * 10000.0 + 0.5) / 10000.0 AS intercept
         FROM ag""",

    "corpus_top_boilerplate" -> s"""WITH $tok,
         shg AS (SELECT doc_id, sg FROM
                   (SELECT doc_id, unnest(list_distinct(
                      CASE WHEN len(tk) >= 8
                           THEN list_transform(generate_series(1, len(tk)-7),
                                               i -> array_to_string(tk[i:i+7], ' '))
                           ELSE []::VARCHAR[] END)) AS sg FROM tok)),
         dfp AS (SELECT sg, CAST(${h60("sg")} AS BIGINT) AS shingle, count(*) AS df
                 FROM shg GROUP BY 1, 2),
         top AS (SELECT sg AS gram, CAST(df AS BIGINT) AS df FROM dfp
                 ORDER BY df DESC, shingle LIMIT 20)
         SELECT gram, df FROM top ORDER BY df DESC, gram""",

    "quality_filter_agreement" -> s"""WITH $tok,
         t2 AS (SELECT doc_id, len(tk) AS n_tokens,
                       len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS punct,
                       length(text) AS nchars,
                       len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is'))) AS stops,
                       list_sum(list_transform(tk, x -> length(x))) AS sum_tok_chars,
                       len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS n_alpha
                FROM tok),
         f AS (SELECT doc_id, n_tokens, stops,
                      floor(least(1.0, n_tokens / 100.0) * 10000.0 + 0.5) / 10000.0 AS len_score,
                      floor((punct * 1.0 / nchars) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                      floor((stops * 1.0 / n_tokens) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
                      floor((least(1.0, n_tokens / 100.0) * 0.4
                            + (1.0 - punct * 1.0 / nchars) * 0.3
                            + least(1.0, stops * 5.0 / n_tokens) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality,
                      floor(sum_tok_chars * 1.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS mean_tok_chars,
                      floor(n_alpha * 1.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS frac_alpha,
                      floor(punct * 1.0 / n_tokens * 10000.0 + 0.5) / 10000.0 AS symbol_ratio
               FROM t2),
         j AS (SELECT doc_id, n_tokens,
                      (n_tokens BETWEEN 50 AND 100000) AND (mean_tok_chars BETWEEN 3.0 AND 10.0)
                        AND frac_alpha >= 0.8 AND stops >= 2 AND symbol_ratio < 0.1 AS rules_pass,
                      floor(greatest(0.0, least(1.0,
                        (len_score * 0.9 - punct_ratio * 1.2 + stop_ratio * 0.6 - 0.1) * 0.5 + 0.5))
                        * 10000.0 + 0.5) / 10000.0 >= 0.55 AS model_keep,
                      quality >= 0.55 AS quality_keep
               FROM f)
         SELECT rules_pass, model_keep, quality_keep,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         FROM j GROUP BY 1, 2, 3""",

    "domain_mix_temperature" -> s"""WITH $tok,
         per AS (SELECT d.source, len(t.tk) AS n
                 FROM tok t JOIN documents d USING (doc_id)),
         src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(n) AS BIGINT) AS n_tokens
                 FROM per GROUP BY 1),
         tt AS (SELECT sum(n_tokens) AS tot FROM src),
         sh AS (SELECT source, n_docs, n_tokens,
                       floor(n_tokens / tot * 10000.0 + 0.5) / 10000.0 AS token_share,
                       CAST(floor(pow(floor(n_tokens / tot * 10000.0 + 0.5) / 10000.0, 0.5)
                                  * 1000000.0 + 0.5) AS BIGINT) AS powed
                FROM src CROSS JOIN tt),
         ns AS (SELECT sum(powed) AS totp FROM sh)
         SELECT source, n_docs, n_tokens, token_share,
                floor(powed / totp * 10000.0 + 0.5) / 10000.0 AS temp_share,
                floor((floor(powed / totp * 10000.0 + 0.5) / 10000.0) / token_share
                      * 10000.0 + 0.5) / 10000.0 AS weight
         FROM sh CROSS JOIN ns""",
  )
}
