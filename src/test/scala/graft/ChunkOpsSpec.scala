package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

class ChunkOpsSpec extends SparkSpec {
  lazy val documents = Tables.documents(spark, sf).cache()

  test("docChunks covers every token and starts at zero") {
    val chunks = TextOps.docChunks(documents).cache()
    val tokTotals = documents.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
    // overlap means chunk tokens sum to >= doc tokens; chunk count is
    // exactly floor((n-1)/stride)+1; first chunk starts at 0
    val per = chunks.groupBy("doc_id").agg(
      sum("n_chunk_tokens").as("covered"),
      count(lit(1)).as("n_chunks"),
      min("chunk_start").as("first_start"))
    val j = per.join(tokTotals, "doc_id")
    assert(j.filter(col("covered") < col("n_toks")).count() === 0)
    assert(j.filter(col("first_start") =!= 0).count() === 0)
    assert(j.filter(col("n_chunks")
      =!= floor((col("n_toks") - 1) / 32) + 1).count() === 0)
    chunks.unpersist()
  }

  test("boilerplateStrip drops shared segments, keeps order, fences edge docs") {
    import spark.implicits._
    // segLen = 3. Docs A and B share the segment "x y z" (boilerplate);
    // A keeps its two unique segments in original order; C is ENTIRELY
    // the shared segment (empty rewrite); D has a short tail segment;
    // E is empty text.
    val docs = Seq(
      (1L, "a b c x y z d e f", "en", "s0", 17L),
      (2L, "x y z q r s", "en", "s0", 11L),
      (3L, "x y z", "en", "s0", 5L),
      (4L, "u v w pq", "en", "s0", 8L),
      (5L, "", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.boilerplateStrip(docs, segLen = 3, maxDocs = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("a b c d e f", 2L, 1L)))   // middle seg removed
    assert(out(2L) === (("q r s", 1L, 1L)))
    assert(out(3L) === (("", 0L, 1L)))              // fully boilerplate
    assert(out(4L) === (("u v w pq", 2L, 0L)))      // short tail kept
    assert(out(5L) === (("", 0L, 0L)))              // empty doc fenced
  }

  test("boilerplateStrip on a no-duplicate corpus is near-identity") {
    // on the real corpus: every doc row survives, kept+dropped = segs,
    // and a doc with zero dropped segments reassembles verbatim
    val out = TextOps.boilerplateStrip(documents).cache()
    assert(out.count() === documents.count())
    val reassembled = out.filter(col("n_dropped") === 0)
      .join(documents.select(col("doc_id"),
        concat_ws(" ", TextOps.tokens(col("text"))).as("norm_text")), "doc_id")
      .filter(col("clean_text") =!= col("norm_text"))
    assert(reassembled.count() === 0)
    out.unpersist()
  }

  test("docChunks chunk 0 is the first min(64, n) tokens verbatim") {
    val c0 = TextOps.docChunks(documents).filter(col("chunk_id") === 0)
    val expected = documents.select(col("doc_id"),
      concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 64))
        .as("expected_text"))
    val bad = c0.join(expected, "doc_id")
      .filter(col("chunk_text") =!= col("expected_text"))
    assert(bad.count() === 0)
  }

  test("chunkDedup accounts for every chunk and keeps a real one") {
    val chunks = TextOps.docChunks(documents).cache()
    val dedup = TextOps.chunkDedup(documents)
    assert(dedup.agg(sum("n_copies")).head.getLong(0) === chunks.count())
    // the kept (doc_id, chunk_id) must exist and hash to its group key
    val bad = dedup.join(chunks,
        dedup("keep_doc_id") === chunks("doc_id")
          && dedup("keep_chunk_id") === chunks("chunk_id"))
      .filter(col("chunk_hash") =!= md5(col("chunk_text")))
    assert(bad.count() === 0)
    chunks.unpersist()
  }

  test("trainSplit partitions the corpus near 80/10/10") {
    val s = TextOps.trainSplit(documents).cache()
    val n = documents.count().toDouble
    assert(s.count().toLong === n.toLong)
    val bys = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys.keySet.subsetOf(Set("train", "val", "test")))
    // hash split is uniform in expectation; loose bounds for n=500
    assert(bys("train") / n > 0.7 && bys("train") / n < 0.9)
    assert(bys.getOrElse("val", 0L) / n < 0.2)
    assert(bys.getOrElse("test", 0L) / n < 0.2)
    s.unpersist()
  }

  test("trainSplitGrouped never separates near-duplicates across splits") {
    val g = TextOps.trainSplitGrouped(documents).cache()
    assert(g.count() === documents.count())
    // the leakage property: one split per component, always
    val straddling = g.groupBy("component")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(straddling.count() === 0)
    // component roots (incl. every singleton) hash on their own id,
    // so they must get exactly C27's assignment
    val c27 = TextOps.trainSplit(documents)
      .select(col("doc_id"), col("split").as("doc_split"))
    val moved = g.filter(col("component") === col("doc_id"))
      .join(c27, "doc_id").filter(col("split") =!= col("doc_split"))
    assert(moved.count() === 0)
    g.unpersist()
  }

  test("trainOrder is a reproducible permutation in shard layout, no Window") {
    val o1 = TextOps.trainOrder(documents).cache()
    assert(o1.count() === documents.count())
    assert(o1.select("doc_id").distinct().count() === documents.count())
    assert(o1.filter(col("shard") < 0 || col("shard") >= 8).count() === 0)
    // same seed reruns identically; a new seed is a different epoch order
    val o2 = TextOps.trainOrder(documents)
    assert(o1.exceptAll(o2).count() === 0)
    val e2 = TextOps.trainOrder(documents, seed = "epoch2")
    assert(o1.join(e2, "doc_id")
      .filter(o1("ord") === e2("ord")).count() === 0)
    // the total order comes from the (shard, ord) sort, never from a
    // single-partition rank window
    val plan = TextOps.trainOrder(documents).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("Sort"), s"expected within-shard sort in:\n$plan")
    o1.unpersist()
  }

  test("sampleTopK is a deterministic nested k-sample via a top-k plan") {
    val s100 = TextOps.sampleTopK(documents, 100).cache()
    assert(s100.count() === 100)
    assert(s100.select("doc_id").distinct().count() === 100)
    // rerun-identical; smaller draws nest inside larger ones
    assert(s100.exceptAll(TextOps.sampleTopK(documents, 100)).count() === 0)
    val s50 = TextOps.sampleTopK(documents, 50)
    assert(s50.exceptAll(s100).count() === 0)
    // a different seed is a different draw
    val other = TextOps.sampleTopK(documents, 100, seed = "other")
    assert(other.join(s100, "doc_id").count() < 100)
    // per-task heaps + driver merge, never a global sort
    val plan = TextOps.sampleTopK(documents, 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k operator in:\n$plan")
    s100.unpersist()
  }

  test("corpusStats conserves corpus totals across the datasheet") {
    val stats = TextOps.corpusStats(documents).cache()
    assert(stats.count()
      === documents.select("source", "lang").distinct().count())
    assert(stats.agg(sum("n_docs")).head.getLong(0) === documents.count())
    // token totals agree with the C9 counter; mean × n == total
    val wsTotal = TextOps.tokenCount(documents)
      .agg(sum("ws_tokens")).head.getLong(0)
    assert(stats.agg(sum("total_tokens")).head.getLong(0) === wsTotal)
    val bad = stats.filter(
      abs(col("mean_tokens") * col("n_docs") - col("total_tokens")) > 1e-6
        || col("min_tokens") > col("max_tokens"))
    assert(bad.count() === 0)
    stats.unpersist()
  }

  test("sampleMix rebalances per source with nested deterministic samples") {
    val mixed = TextOps.sampleMix(documents,
      Map("src0" -> 0.5, "src1" -> 0.2, "src2" -> 0.0)).cache()
    val by = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = documents.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!by.contains("src2"))
    assert(by("src0") < full("src0") && by("src0") > 0)
    // unlisted sources keep every row
    assert(by("src5") === full("src5"))
    // nesting: the 0.2 sample of src0 is a subset of the 0.5 sample
    val tighter = TextOps.sampleMix(documents, Map("src0" -> 0.2))
      .filter(col("source") === "src0")
    assert(tighter.join(mixed.filter(col("source") === "src0"),
      Seq("doc_id"), "left_anti").count() === 0)
    mixed.unpersist()
  }

  test("trainSplit is append-stable: a subset keeps its assignments") {
    val full = TextOps.trainSplit(documents)
    val subset = TextOps.trainSplit(documents.filter(col("doc_id") < 100))
    val moved = subset.as("s").join(full.as("f"), Seq("doc_id"))
      .filter(col("s.split") =!= col("f.split"))
    assert(moved.count() === 0)
  }

  test("bpePairs ranks adjacent-pair counts correctly") {
    val p = TextOps.bpePairs(documents, 50).collect().sortBy(_.getLong(0))
    assert(p.length <= 50)
    assert(p.map(_.getLong(0)).toSeq === (1L to p.length))
    val counts = p.map(_.getLong(2))
    assert(counts.sameElements(counts.sortBy(-_)))
    // top pair count matches a direct computation
    val toks = TextOps.tokens(col("text"))
    val direct = documents
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").count().agg(max("count")).head.getLong(0)
    assert(p.head.getLong(2) === direct)
  }
}
