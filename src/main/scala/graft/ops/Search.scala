package graft.ops

import graft.Tables
import graft.functions.Hashing._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Full-text relevance scoring over the documents table — the retrieval
  * primitive a training-data pipeline uses for targeted corpus probes
  * (find the docs most about X) and quality slicing.
  *
  * Scale design: BM25 needs three corpus statistics — N, avg doc
  * length, per-term document frequency. All three are one aggregate
  * each; the per-(doc, term) term frequencies come from one explode +
  * hash aggregate whose shuffle carries only rows matching the query
  * terms (the filter is pushed below the aggregate, so the shuffle is
  * proportional to matching occurrences, not the token stream). The
  * df/stats sides are O(|terms|) and O(1) and broadcast; the final
  * top-k is orderBy+limit → TakeOrderedAndProject (per-partition heads,
  * never a global sort).
  *
  * Exactness: the idf uses the RATIONAL form (N − df + 0.5)/(df + 0.5)
  * rather than the usual log of it — Spark's Math.log and DuckDB's ln
  * are each correctly rounded in practice but not guaranteed
  * bit-identical across libm implementations, and a hash-exact oracle
  * beats the last-ulp of a monotone transform. Ranking order for a
  * single-term match is identical; multi-term scores weight rare terms
  * harder than the log form — documented, deliberate.
  */
object Search {
  type Q = (SparkSession, String) => DataFrame

  private val bmTerms = Seq("spark", "shuffle", "query", "join")
  private val bmK1 = 1.2
  private val bmB = 0.75
  private val bmTopK = 10

  // score(doc, t) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  // written with the same association on both engines so every
  // intermediate double is bit-identical.
  private def bmScore(tf: Column, dl: Column, avgdl: Column, n: Column, df: Column): Column =
    ((n - df + lit(0.5)) / (df + lit(0.5))) *
      ((tf * lit(bmK1 + 1.0)) /
        (tf + lit(bmK1) * (lit(1.0 - bmB) + lit(bmB) * (dl / avgdl))))

  // every float literal carries an e0 exponent: DuckDB parses bare
  // decimal literals as DECIMAL and would run exact-decimal arithmetic
  // where Spark runs double (one ulp apart whenever tf isn't a power
  // of two); exponent notation forces DOUBLE on both engines
  private def sqlBmScore(tf: String, dl: String, avgdl: String, n: String, df: String): String =
    s"(($n - $df + 0.5e0) / ($df + 0.5e0)) * " +
      s"(($tf * ${bmK1 + 1.0}e0) / " +
      s"($tf + ${bmK1}e0 * (${1.0 - bmB}e0 + ${bmB}e0 * ($dl / $avgdl))))"

  // ---------------------------------------------------------------------
  // q_bm25 — BM25 top-10 for a fixed conjunctive-free keyword query.
  // Per doc: number of distinct query terms present and the summed
  // per-term score, the terms folded in FIXED declaration order (double
  // addition is order-dependent; a sum() over an unordered group would
  // not be reproducible).
  // ---------------------------------------------------------------------
  val bm25: Q = (s, d) =>
    bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(bmTopK)

  /** Every document matching at least one query term, BM25-scored:
    * (doc_id, lang, n_match, score) — the shared scoring pipeline
    * behind [[bm25]] (top-k cut) and [[hybridSearch]] (rank fusion).
    */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val docs = Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val termArray = array(bmTerms.map(lit): _*)
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
      .filter(col("t").isInCollection(bmTerms))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val df = docs
      .select(explode(array_intersect(termArray, col("toks"))).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), Seq("t"))
      .crossJoin(broadcast(stats)) // 1-row stats witness
      .withColumn(
        "s",
        bmScore(col("tf"), col("dl"), col("avgdl"), col("n_docs"), col("df")))
    // fixed-order fold over the terms: score = s(t1) + s(t2) + ... with
    // absent terms contributing an exact 0.0
    val perTerm = scored
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_match"),
        bmTerms.map(t =>
          coalesce(max(when(col("t") === t, col("s"))), lit(0.0))
            .as(s"s_$t")): _*)
    perTerm
      .withColumn("score", bmTerms.map(t => col(s"s_$t")).reduce(_ + _))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_match"), col("score"))
  }

  val bm25Sql: String = {
    val toks = sqlTokens("text")
    val termList = bmTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    val sumExpr = bmTerms
      .map(t => s"COALESCE(MAX(CASE WHEN t = '$t' THEN s END), 0.0)")
      .mkString(" + ")
    val nMatch = "COUNT(*)"
    s"""WITH d AS (
       |  SELECT doc_id, lang, $toks AS toks, CAST(len($toks) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
       |  FROM d),
       |tf AS (
       |  SELECT doc_id, dl, t, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM d)
       |  WHERE list_contains($termList, t)
       |  GROUP BY doc_id, dl, t),
       |df AS (
       |  SELECT t, count(*) AS df
       |  FROM (SELECT unnest(list_intersect($termList, toks)) AS t FROM d)
       |  GROUP BY t),
       |scored AS (
       |  SELECT tf.doc_id, tf.t,
       |    ${sqlBmScore("tf.tf", "tf.dl", "stats.avgdl", "stats.n_docs", "df.df")} AS s
       |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN stats),
       |folded AS (
       |  SELECT doc_id, CAST($nMatch AS BIGINT) AS n_match, $sumExpr AS score
       |  FROM scored GROUP BY doc_id)
       |SELECT f.doc_id, dd.lang, f.n_match, f.score
       |FROM folded f JOIN documents dd ON dd.doc_id = f.doc_id
       |ORDER BY f.score DESC, f.doc_id ASC LIMIT $bmTopK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_hybrid_search — HYBRID RETRIEVAL: the keyword shortlist (BM25
  // over `documents`) fused with the semantic shortlist (embedding
  // cosine against a fixed query vector over `embeddings`, id-joined
  // doc_id == vec_id) by Reciprocal Rank Fusion:
  //   rrf(d) = 1/(k + rank_text(d)) + 1/(k + rank_vec(d)),   k = 60
  // — the standard fusion behind every lexical+vector retrieval stack
  // (Cormack/Clarke/Buettcher SIGIR'09; what OpenSearch/Vespa ship),
  // and the targeted-corpus-probe shape a training-data pipeline runs
  // when neither modality alone is trustworthy. Ranks are integers, so
  // the fused score is a sum of exact double reciprocals — oracle
  // hash-exact with no float drift.
  //
  // Scale: each modality produces its shortlist with its own bounded
  // machinery (BM25 = term-keyed aggregates + TakeOrderedAndProject;
  // cosine = one corpus scan vs a broadcast query — the brute baseline
  // whose LSH/IVF scale paths live in Embeddings); the global ranking
  // window runs over ≤ 2·T ALREADY-SHORTLISTED rows, and the fusion
  // is a full-outer join of two T-row frames — O(T), independent of
  // corpus size.
  // ---------------------------------------------------------------------
  private val hybridT = 50 // shortlist depth per modality
  private val hybridRrfK = 60 // the SIGIR'09 constant
  private val hybridTopK = 15
  private val hybridQueryVec = 1L // vec_id whose embedding is the query

  val hybridSearch: Q = (s, d) => {
    val textTop = bm25Scored(s, d)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(hybridT) // TakeOrderedAndProject: per-partition heads
      .withColumn("r_text",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id").asc))
          .cast("long")) // global window over <= T rows only
      .select(col("doc_id").as("id"), col("r_text"))
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === hybridQueryVec)
      .select(col("embedding").as("qv"))
    val vecTop = e
      .filter(col("vec_id") =!= hybridQueryVec)
      .crossJoin(broadcast(q)) // 1-row query-vector witness
      .select(
        col("vec_id"),
        (fdot(col("qv"), col("embedding")) /
          (sqrt(fdot(col("qv"), col("qv"))) *
            sqrt(fdot(col("embedding"), col("embedding"))))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(hybridT)
      .withColumn("r_vec",
        row_number()
          .over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long"))
      .select(col("vec_id").as("id"), col("r_vec"))
    textTop
      .join(vecTop, Seq("id"), "full_outer")
      .select(
        col("id").as("doc_id"),
        col("r_text"),
        col("r_vec"),
        (coalesce(lit(1.0) / (lit(hybridRrfK) + col("r_text")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(hybridRrfK) + col("r_vec")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(hybridTopK)
  }

  val hybridSearchSql: String = {
    val toks = sqlTokens("text")
    val termList = bmTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    val sumExpr = bmTerms
      .map(t => s"COALESCE(MAX(CASE WHEN t = '$t' THEN s END), 0.0)")
      .mkString(" + ")
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, $toks AS toks, CAST(len($toks) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
       |  FROM d),
       |tf AS (
       |  SELECT doc_id, dl, t, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM d)
       |  WHERE list_contains($termList, t)
       |  GROUP BY doc_id, dl, t),
       |df AS (
       |  SELECT t, count(*) AS df
       |  FROM (SELECT unnest(list_intersect($termList, toks)) AS t FROM d)
       |  GROUP BY t),
       |scored AS (
       |  SELECT tf.doc_id, tf.t,
       |    ${sqlBmScore("tf.tf", "tf.dl", "stats.avgdl", "stats.n_docs", "df.df")} AS s
       |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN stats),
       |folded AS (
       |  SELECT doc_id, $sumExpr AS score FROM scored GROUP BY doc_id),
       |text_top AS (
       |  SELECT doc_id AS id, CAST(row_number() OVER (
       |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r_text
       |  FROM folded ORDER BY score DESC, doc_id ASC LIMIT $hybridT),
       |qv AS (SELECT embedding FROM embeddings WHERE vec_id = $hybridQueryVec),
       |cosed AS (
       |  SELECT e.vec_id,
       |    ${sqlCosine("qv.embedding", "e.embedding")} AS cos
       |  FROM embeddings e CROSS JOIN qv
       |  WHERE e.vec_id != $hybridQueryVec),
       |vec_top AS (
       |  SELECT vec_id AS id, CAST(row_number() OVER (
       |    ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS r_vec
       |  FROM cosed ORDER BY cos DESC, vec_id ASC LIMIT $hybridT)
       |SELECT COALESCE(t.id, v.id) AS doc_id, t.r_text, v.r_vec,
       |  COALESCE(1.0e0 / ($hybridRrfK + t.r_text), 0.0) +
       |  COALESCE(1.0e0 / ($hybridRrfK + v.r_vec), 0.0) AS rrf
       |FROM text_top t FULL OUTER JOIN vec_top v ON t.id = v.id
       |ORDER BY rrf DESC, doc_id ASC LIMIT $hybridTopK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_tfidf_terms — top-3 characteristic terms per language by TF-IDF
  // over the language-partitioned corpus (df = number of LANGUAGES a
  // token appears in): the feature-extraction primitive under topic
  // probes and per-source vocabulary drift checks. Same rational idf as
  // q_bm25; score = tf · idf is one multiply + one divide on identical
  // operands, so it hash-matches. Ties break on the token string.
  // Scale: tf is one hash aggregate on (lang, token); df is a second
  // aggregate OVER THE TF TABLE (distinct langs per token — rows are
  // already unique per (lang, token), so count(*) suffices); the
  // language count is a 1-row broadcast witness; top-3 per lang is a
  // WindowGroupLimit, never a global sort.
  // ---------------------------------------------------------------------
  private val tfidfK = 3

  val tfidfTerms: Q = (s, d) => {
    val tf = Tables
      .documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("lang"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val df = tf
      .groupBy(col("t"))
      .agg(count(lit(1)).as("df"))
    val nLangs = tf.select(col("lang")).distinct().agg(count(lit(1)).as("n_langs"))
    val w = Window
      .partitionBy(col("lang"))
      .orderBy(col("score").desc, col("t").asc)
    tf.join(df, Seq("t"))
      .crossJoin(broadcast(nLangs)) // 1-row witness
      .withColumn(
        "score",
        col("tf") * ((col("n_langs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= tfidfK)
      .select(col("lang"), col("t").as("token"), col("tf"), col("df"), col("score"), col("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  val tfidfTermsSql: String = {
    val toks = sqlTokens("text")
    s"""WITH tf AS (
       |  SELECT lang, t, count(*) AS tf
       |  FROM (SELECT lang, unnest($toks) AS t FROM documents)
       |  GROUP BY lang, t),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
       |nl AS (SELECT count(DISTINCT lang) AS n_langs FROM tf),
       |scored AS (
       |  SELECT tf.lang, tf.t, tf.tf, df.df,
       |    tf.tf * ((nl.n_langs - df.df + 0.5e0) / (df.df + 0.5e0)) AS score
       |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN nl)
       |SELECT lang, t AS token, tf, df, score,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM (SELECT *, row_number() OVER (PARTITION BY lang
       |        ORDER BY score DESC, t ASC) AS rnk FROM scored)
       |WHERE rnk <= $tfidfK ORDER BY lang, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_inverted_index — posting-list construction, the indexing dual of
  // q_bm25's query-time scoring: per term, document frequency, total
  // term frequency, and the head of the posting list (top-3 docs by
  // tf, doc_id — the impact-ordered prefix an early-termination scorer
  // reads first). One explode + two hash aggregates; the per-term
  // posting head rides the sorted-collect idiom (collect_list has no
  // intrinsic order) and is emitted as ONE joined string so the
  // compare stays scalar. Top-20 terms by (df, term) — deterministic,
  // and TakeOrderedAndProject keeps it per-partition heads at scale.
  // ---------------------------------------------------------------------
  private val invK = 20

  val invertedIndex: Q = (s, d) => {
    val tf = Tables
      .documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(
          transform(
            slice(
              array_sort(collect_list(struct(
                (col("tf") * lit(-1L)).as("nt"),
                col("doc_id").as("k")))),
              1, 3),
            e => e.getField("k").cast("string")),
          ",").as("top_docs"))
      .orderBy(col("df").desc, col("term"))
      .limit(invK)
  }

  val invertedIndexSql: String = {
    val toks = sqlTokens("text")
    s"""WITH tf AS (
       |  SELECT t AS term, doc_id, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)
       |  GROUP BY 1, 2)
       |SELECT term, count(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       |  array_to_string(
       |    (list(CAST(doc_id AS VARCHAR) ORDER BY tf DESC, doc_id ASC))[1:3],
       |    ',') AS top_docs
       |FROM tf GROUP BY term
       |ORDER BY df DESC, term LIMIT $invK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_phrase_search — POSITIONAL postings + exact phrase query, the
  // other half of a search surface (q_inverted_index stores df/tf and
  // impact-ordered heads; without positions an exact phrase is not
  // expressible). Construction is one posexplode + one aggregate:
  // (term, doc_id) -> sorted position array. A two-word phrase "w1 w2"
  // then answers WITHOUT touching text: join the two terms' postings
  // per doc and intersect pos(w1)+1 with pos(w2) — the classic
  // positional-merge, O(|postings|) per doc, and at 100 TB the join is
  // two term-key lookups instead of a corpus scan. The phrase itself
  // is data-derived (the corpus's top bigram by document frequency,
  // ties lexicographic) so the gate never goes stale on a fixture
  // regeneration; the DuckDB twin recomputes the same phrase and
  // counts matches by direct ADJACENCY SCAN over the token lists — two
  // independent formulations (position intersect vs adjacency) that
  // must agree exactly.
  // ---------------------------------------------------------------------
  val phraseSearch: Q = (s, d) => {
    val docs = Tables
      .documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .localCheckpoint(true) // read by phrase pick AND postings build
    // positional postings: one explode, one aggregate
    val postings = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
    // the query phrase: top bigram by df (O(1) driver scalar, the
    // argmax-collect pattern of the BPE lanes)
    val top = docs
      .select(explode(wordBigrams(col("toks"))).as("bg"))
      .filter(col("bg").contains(" "))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bg").asc)
      .limit(1)
      .collect()(0)
      .getString(0)
    val Array(w1, w2) = top.split(" ")
    val p1 = postings
      .filter(col("term") === w1)
      .select(col("doc_id"), col("positions").as("p1"))
    val p2 = postings
      .filter(col("term") === w2)
      .select(col("doc_id"), col("positions").as("p2"))
    p1.join(p2, Seq("doc_id"))
      .withColumn(
        "n_hits",
        size(array_intersect(transform(col("p1"), p => p + 1), col("p2")))
          .cast("long"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), lit(top).as("phrase"), col("n_hits"))
      .orderBy(col("doc_id"))
  }

  val phraseSearchSql: String = {
    val toks = sqlTokens("text")
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       |tb AS (
       |  SELECT bg, count(*) AS cnt
       |  FROM (SELECT unnest(${sqlWordBigrams("toks")}) AS bg FROM d)
       |  WHERE contains(bg, ' ')
       |  GROUP BY bg ORDER BY cnt DESC, bg ASC LIMIT 1),
       |q AS (
       |  SELECT bg, str_split(bg, ' ')[1] AS w1, str_split(bg, ' ')[2] AS w2
       |  FROM tb),
       |hits AS (
       |  SELECT doc_id, q.bg,
       |    CAST(len(list_filter(range(1, len(toks)),
       |      i -> toks[i] = q.w1 AND toks[i + 1] = q.w2)) AS BIGINT) AS n_hits
       |  FROM d, q)
       |SELECT doc_id, bg AS phrase, n_hits
       |FROM hits WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_bm25" -> bm25,
    "q_hybrid_search" -> hybridSearch,
    "q_tfidf_terms" -> tfidfTerms,
    "q_inverted_index" -> invertedIndex,
    "q_phrase_search" -> phraseSearch
  )

  val oracleSql: Map[String, String] = Map(
    "q_bm25" -> bm25Sql,
    "q_hybrid_search" -> hybridSearchSql,
    "q_tfidf_terms" -> tfidfTermsSql,
    "q_inverted_index" -> invertedIndexSql,
    "q_phrase_search" -> phraseSearchSql
  )
}
