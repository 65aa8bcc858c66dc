package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: the concat-and-chunk step
  * that lays documents end-to-end into a token stream and cuts it into
  * fixed-length training sequences. Each document gets its stream offset
  * and the range of sequence ids it lands in, from which a writer can
  * emit attention-boundary masks or split shards without ever
  * materializing the concatenated stream.
  *
  * Deterministic by construction — offsets follow the (shard, id) order,
  * so re-runs, engine ports and corpus growth within other shards never
  * move a document's sequence assignment.
  *
  * Scale shape: ONE window shuffle, partitioned by `shardCol`. The
  * running sum is per shard, which is what a real corpus wants anyway
  * (shards = sources/splits written independently); a single global
  * stream would serialize the cumulative sum into one partition, which
  * is exactly the degenerate case this signature makes hard to write.
  */
object Packing {

  /** @param nTokensCol per-doc token count (precomputed — e.g.
    *                   [[graft.functions.VectorFunctions.tokenCountsStruct]])
    * @return input columns + `start_off` (token offset of the doc inside
    *         its shard's stream), `seq_first`/`seq_last` (ids of the
    *         seqLen-sized chunks the doc spans, docs straddle boundaries
    *         as in standard concat-then-chunk packing)
    */
  def pack(df: DataFrame, idCol: String, nTokensCol: String,
           shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    df.withColumn("_end", sum(col(nTokensCol)).over(w))
      .withColumn("start_off", col("_end") - col(nTokensCol))
      // integer-exact chunk math (doubles are exact below 2^53 — offsets
      // beyond that are past any real corpus, but stay in longs anyway)
      .withColumn("seq_first",
        floor(col("start_off") / lit(seqLen.toLong)).cast("long"))
      .withColumn("seq_last",
        floor((col("_end") - 1) / lit(seqLen.toLong)).cast("long"))
      .drop("_end")
  }

  /** [[pack]] MATERIALIZED — the pipeline's last step emitting
    * training-ready sequences: tokenize each document into ids under a
    * pluggable [[graft.functions.TokenEncoder]] (greedy BPE built in),
    * lay the ids end-to-end per shard in (shard, doc-id) order — the
    * exact stream [[pack]] describes by offsets — and cut it into
    * `seqLen`-token rows. Output: one row per sequence,
    * (shardCol, seq_id, token_ids `array<int>`, n_tokens, doc_starts),
    * where `token_ids` has exactly `seqLen` elements except each
    * shard's last sequence (unpadded by default; pass `padId` to fill
    * it to fixed width — `n_tokens` keeps the real count either way)
    * and `doc_starts` lists the in-sequence offsets where a NEW
    * document begins — the attention-boundary information a trainer
    * needs for block-diagonal masks over packed sequences, free at pack
    * time and expensive to re-derive later. Documents straddle sequence
    * boundaries, standard concat-then-chunk; agreement with [[pack]] is
    * exact: a doc's ids land at [start_off, start_off + n) in its
    * shard's stream, so its sequences are precisely
    * seq_first..seq_last.
    *
    * Scale shape: the per-shard offset window runs over NARROW
    * (shard, id, count) rows — counts come from the codegen'd
    * [[graft.functions.TokenCountExpr]] pass, so neither the text nor
    * the id arrays ever ride the serialized per-shard sort (the count
    * is recomputed rather than carried: one cheap extra scan beats
    * shuffling the whole token stream into one partition per shard).
    * Offsets then hash-JOIN back to the documents (parallel across the
    * cluster), the encode itself is one codegen'd projection feeding
    * the explode (ids never exist driver-side; the exploded bytes ARE
    * the output), and the final groupBy((shard, seq_id)) is one hash
    * shuffle whose groups are BOUNDED at seqLen rows each — no hot key
    * at any corpus size, skew capped by construction. Deterministic end
    * to end: offsets are (shard, id)-ordered, the in-sequence sort key
    * is the global token position.
    *
    * Single-walk formulations were A/B'd in round 20 and LOSE to this
    * recompute shape now that the greedy-BPE walk is heap-ordered
    * (O(n log n) per word, Tokenize.scala): (a) sharing one encode
    * projection through a reused exchange is defeated by
    * InferFiltersFromGenerate, which re-expands the ids alias into a
    * pushed filter on one branch only — breaking reuse AND adding a
    * third walk; (b) a localCheckpoint boundary at the encoded frame
    * computes the walk once but its materialization costs more than
    * the walk it saves (q113 min-of-5 1.42×, q164 1.17× — the token
    * terminals never had a second walk to save, their count rides in
    * via `nTokensCol`).
    */
  def packTokens(df: DataFrame, idCol: String, textCol: String,
                 shardCol: String, seqLen: Int,
                 encoder: graft.functions.TokenEncoder,
                 padId: Option[Int] = None,
                 nTokensCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val docs = df.where(col(textCol).isNotNull)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    // `nTokensCol` lets a caller that ALREADY carries the encoder's
    // count (the curateTokens budget stage computed it for the fracs)
    // feed the offset window directly — recomputing the count here
    // would run the walk a second full time over every surviving
    // document. The caller owns the contract that the column IS this
    // encoder's count (curateTokens passes the same encoder both
    // places); a drifted count silently corrupts global offsets, so
    // callers without that guarantee must leave it None.
    val counted = nTokensCol match {
      case Some(c) => docs.select(col(shardCol), col(idCol),
        col(c).cast("long").as("_n"))
      case None => docs.select(col(shardCol), col(idCol),
        graft.functions.TokenCounters.count(encoder, col(textCol)).as("_n"))
    }
    val offsets = counted
      .withColumn("_start", sum(col("_n")).over(w) - col("_n"))
      .select(col(shardCol), col(idCol), col("_start"))
    val packed = docs.join(offsets, Seq(shardCol, idCol))
      .select(col(shardCol), col("_start"),
        posexplode(graft.functions.TokenCounters.encode(encoder, col(textCol)))
          .as(Seq("_p", "_tid")))
      .select(col(shardCol), (col("_start") + col("_p")).as("_g"), col("_tid"),
        (col("_p") === 0).as("_ds"))
      .groupBy(col(shardCol),
        floor(col("_g") / lit(seqLen.toLong)).cast("long").as("seq_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("_g"), col("_tid")))),
          x => x.getField("_tid")).as("token_ids"),
        count(lit(1)).as("n_tokens"),
        // in-sequence offsets where a NEW document begins (a doc
        // straddling in from the previous sequence does not mark 0) —
        // what a trainer needs to build block-diagonal attention masks
        // without re-deriving boundaries from the ids. collect_list
        // drops the nulls the `when` leaves on non-boundary tokens.
        sort_array(collect_list(
          when(col("_ds"), (col("_g") % seqLen).cast("int"))))
          .as("doc_starts"))
    padId match {
      case None => packed
      case Some(p) =>
        // fixed-width rows for trainers that want them: each shard's
        // short LAST sequence fills to seqLen with the pad id;
        // n_tokens keeps the REAL count, doc_starts is unaffected
        packed.withColumn("token_ids",
          when(size(col("token_ids")) < seqLen,
            concat(col("token_ids"),
              array_repeat(lit(p), lit(seqLen) - size(col("token_ids")))))
            .otherwise(col("token_ids")))
    }
  }

  /** [[pack]]'s dual — PER-DOC sliding-window chunking, the
    * embedding/retrieval-context prep step (a doc too long for the
    * encoder splits into `maxWords`-word chunks overlapping by
    * `overlap`, so no boundary sentence loses its context): chunk k
    * covers words [k·stride+1, k·stride+maxWords], stride =
    * maxWords − overlap, last chunk clamped at the doc end; a doc of
    * ≤ maxWords words is ONE chunk of itself. Whitespace tokenization
    * (the q35/q58 single-space convention); docs with null text or no
    * words produce no chunks.
    *
    * Scale shape: row-local arithmetic + one explode — a PROJECTION,
    * zero shuffle, zero joins; chunk count per row is bounded by doc
    * length, so output size is corpus tokens × (1 + overlap/stride),
    * never quadratic. Deterministic: chunk boundaries are pure integer
    * math, stable under repartition/growth/engine port.
    *
    * Output: (doc_id, chunk_id 0-based, chunk_text, n_words).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                maxWords: Int, overlap: Int = 0): DataFrame = {
    require(maxWords > 0, s"maxWords must be positive: $maxWords")
    require(overlap >= 0 && overlap < maxWords,
      s"overlap must be in [0, maxWords): $overlap")
    val stride = maxWords - overlap
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("_w"))
      .where(size(col("_w")) > 0)
      // nChunks = 1 + ceil((n - maxWords) / stride) for n > maxWords,
      // else 1 — as integer division: 1 + max(0, (n - maxWords + stride
      // - 1) div stride)
      .select(col("doc_id"), col("_w"),
        (lit(1) + greatest(lit(0),
          floor((size(col("_w")) - maxWords + stride - 1) /
            lit(stride.toDouble)).cast("int"))).as("_nc"))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, _nc - 1), " +
          s"k -> concat_ws(' ', slice(_w, k * $stride + 1, $maxWords)))"))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        size(expr("split(chunk_text, ' ')")).cast("bigint").as("n_words"))
  }

  /** Tokenized-corpus data card — the trainer-side audit that prices a
    * [[packTokens]] run WITHOUT paying the pack shuffle: because ids lay
    * end-to-end per shard, sequence counts are pure arithmetic over the
    * per-document token totals (n_seqs = ⌈tokens/seqLen⌉, one short
    * trailing sequence iff tokens mod seqLen ≠ 0) — no global-position
    * window, no per-sequence groups. Per shard: contributing docs, total
    * tokens, the derived sequence counts, distinct vocabulary actually
    * used, and the `topN` most frequent ids (count desc, id asc — the
    * padding/boilerplate-id smell test).
    *
    * Shape at 100 TB: two independent aggregation branches joined on the
    * shard key — doc totals never explode (the codegen'd COUNT
    * expression), the id branch is one map-side-combined (shard, id)
    * count whose per-shard group is VOCABULARY-bounded, with a top-N
    * window over that bounded table. All outputs are exact integers —
    * the card hash-checks with no rounding contract at all.
    */
  /** Tokenizer fertility audit — the tokenizer-CHOICE gauge: per group
    * (usually language), how many subword ids the encoder spends per
    * whitespace word (fertility) and how many characters each id covers
    * (compression). The table that decides whether a vocabulary is fair
    * to a language: high fertility = the tokenizer shreds that group's
    * words, inflating its effective sequence length and training cost.
    * Output per group: n_docs, n_words, n_ids, fertility = ids/words,
    * chars_per_id — the ratios SINGLE correctly-rounded divisions of
    * exact integer sums (rounded at 6), null on zero denominators.
    *
    * Shape at 100 TB: one codegen'd encode pass per document, then one
    * map-side-combined aggregation on the bounded group key. No join,
    * no window, text never shuffles.
    */
  def tokenizerFertility(df: DataFrame, textCol: String, groupCol: String,
                         encoder: graft.functions.TokenEncoder): DataFrame = {
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6))
    df.where(col(textCol).isNotNull)
      .select(col(groupCol),
        expr(s"size(filter(split($textCol, ' '), x -> x <> ''))")
          .cast("long").as("_w"),
        graft.functions.TokenCounters.count(encoder, col(textCol)).as("_i"),
        length(col(textCol)).cast("long").as("_c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_w")).as("n_words"),
        sum(col("_i")).as("n_ids"), sum(col("_c")).as("_chars"))
      .select(col(groupCol), col("n_docs"), col("n_words"), col("n_ids"),
        ratio(col("n_ids"), col("n_words")).as("fertility"),
        ratio(col("_chars"), col("n_ids")).as("chars_per_id"))
      .orderBy(col(groupCol))
  }

  def tokenizedCard(df: DataFrame, idCol: String, textCol: String,
                    shardCol: String, seqLen: Int,
                    encoder: graft.functions.TokenEncoder,
                    topN: Int = 5): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(topN > 0, s"topN must be positive: $topN")
    val docs = df.where(col(textCol).isNotNull)
    val docStats = docs.select(col(shardCol),
        graft.functions.TokenCounters.count(encoder, col(textCol)).as("_n"))
      .groupBy(col(shardCol))
      .agg(count(when(col("_n") > 0, lit(1))).as("n_docs"),
        sum(col("_n")).as("n_tokens"))
      .select(col(shardCol), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen").as("n_seqs"),
        (col("n_tokens") % seqLen =!= 0).cast("int").as("n_short"))
    val perTid = docs.select(col(shardCol),
        explode(graft.functions.TokenCounters.encode(encoder, col(textCol)))
          .as("tid"))
      .groupBy(col(shardCol), col("tid")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col("_c").desc, col("tid"))
    val tidStats = perTid
      .withColumn("_r", row_number().over(w))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("distinct_ids"),
        transform(array_sort(collect_list(
            when(col("_r") <= topN, struct(col("_r"), col("tid"))))),
          x => x.getField("tid")).as("top_ids"))
    docStats.join(tidStats, Seq(shardCol), "left")
      .select(col(shardCol), col("n_docs"), col("n_tokens"), col("n_seqs"),
        col("n_short"), coalesce(col("distinct_ids"), lit(0L)).as("distinct_ids"),
        coalesce(col("top_ids"), expr("array()").cast("array<int>")).as("top_ids"))
  }
}
