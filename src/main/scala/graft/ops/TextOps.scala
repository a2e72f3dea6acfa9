package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * language-ID heuristic, quality scoring, document fingerprinting.
  * All deterministic, all expressed over the `documents` table shape
  * (doc_id, text, lang, source, n_chars).
  */
object TextOps {

  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Word hash in the cross-engine 62-bit domain (see [[XHash]]) so the
    * DuckDB oracle can recompute every dedup signature exactly.
    */
  def hashWord(w: String): Long = XHash.hashChars(w)

  /** Whitespace word split as a column. */
  def wordsCol(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: whitespace words, long words split into <=4-char
    * pieces (a deterministic proxy for a subword tokenizer's token count).
    */
  val subwordCountUdf = udf { text: String =>
    if (text == null || text.isEmpty) 0L
    else text.split(" ").iterator.map(w => (w.length + 3L) / 4L).sum
  }

  /** Word n-gram shingle hashes (distinct, sorted) — the dedup unit.
    * Each shingle = XHash.fold of its word hashes (oracle-recomputable).
    */
  def shingleUdf(n: Int) = udf { words: Seq[String] =>
    if (words == null || words.length < n) Array.empty[Long]
    else
      words
        .sliding(n)
        .map(gram => XHash.fold(gram.iterator.map(hashWord).toArray))
        .toArray
        .distinct
        .sorted
  }

  /** SimHash over word hashes: 62 signature bits (the cross-engine hash
    * domain; bits 62/63 unused).
    */
  val SimhashBits = 62
  val simhashUdf = udf { words: Seq[String] =>
    if (words == null || words.isEmpty) 0L
    else {
      val counts = new Array[Int](SimhashBits)
      words.foreach { w =>
        val h = hashWord(w)
        var b = 0
        while (b < SimhashBits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < SimhashBits) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
      sig
    }
  }

  /** Rolling-hash document fingerprint (FNV-1a fold over all chars + mix,
    * 62-bit domain — oracle-recomputable).
    */
  val fingerprintUdf = udf { text: String =>
    if (text == null) 0L else XHash.hashChars(text)
  }

  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "on"),
    "es" -> Set("el", "la", "de", "y", "en", "es", "un", "que"),
    "de" -> Set("der", "die", "das", "und", "in", "ist", "ein", "zu"),
    "fr" -> Set("le", "la", "de", "et", "en", "est", "un", "que")
  )

  /** N-gram/stopword language-ID heuristic: argmax over per-language
    * stopword hit counts; ties and zero hits fall back to "en".
    */
  val langIdUdf = udf { words: Seq[String] =>
    if (words == null || words.isEmpty) "en"
    else {
      val scores = stopwords.map { case (lang, sw) =>
        (lang, words.count(w => sw.contains(w)))
      }
      val best = scores.maxBy { case (lang, c) => (c, lang) }
      if (best._2 == 0) "en" else best._1
    }
  }

  /** Quality features: word count, characters sans spaces, mean word length
    * scaled x100 (integer — cross-engine safe), share of short words x1000.
    * word_count/chars_nospace count spaces directly (space-count + 1 /
    * length minus spaces) rather than via split(), so multi-space and
    * leading/trailing-space text yields the same numbers in any engine.
    */
  def withQualityFeatures(docs: DataFrame): DataFrame = {
    docs
      .withColumn("words", wordsCol(col("text")))
      .withColumn("chars_nospace", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn(
        "word_count",
        (length(col("text")) - col("chars_nospace") + 1).cast("long")
      )
      .withColumn(
        "mean_word_len_x100",
        (col("chars_nospace") * 100L / greatest(col("word_count"), lit(1L))).cast("long")
      )
      .withColumn(
        "stopword_hits",
        size(filter(col("words"), w => w.isin("the", "a", "of", "and", "to", "in", "is", "on")))
          .cast("long")
      )
      .drop("words")
  }
}
