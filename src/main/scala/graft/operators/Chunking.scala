package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ColumnOps

/** Overlapping token-window chunking — the serving-side sibling of
  * [[Packing]]: where packing concatenates documents up to a training
  * token budget, chunking SPLITS each document into fixed-size windows
  * with overlap (the retrieval/RAG ingestion shape: embed each chunk,
  * retrieve by chunk, attribute by (doc, chunk) id).
  *
  * Everything is row-local closed form — tokenize once, derive the chunk
  * list with array HOFs, explode. Scan-stage work, zero shuffles; at
  * 100 TB this runs at read speed and the output is ~`n_tokens/stride`
  * rows per document.
  *
  * Chunk layout for window W, overlap O (stride S = W−O): chunk i
  * covers tokens [i·S, i·S + min(W, n − i·S)); the last chunk starts at
  * the largest i·S < n − O (equivalently `nChunks = 1` if n ≤ W else
  * `⌊(n − W + S − 1)/S⌋ + 1`), so every token is covered, consecutive
  * chunks share exactly O tokens, and no degenerate all-overlap tail
  * chunk is emitted.
  */
object Chunking {

  /** Explode `textCol` into overlapping token-window chunks:
    * (id, chunk_id, start_token, n_tokens, chunk_text). Null-text rows
    * produce no chunks; empty text produces one (its single empty
    * token). Deterministic — oracle-checkable. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 64, overlap: Int = 16): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap for window $window")
    val stride = window - overlap
    val chunks: Column = ColumnOps.bind(TokenOps.tokenize(col(textCol)),
      toks => {
        val n = size(toks)
        // ints are exact in double arithmetic, so floor(x/y) here IS
        // integer division — and the same text works in the SQL mirror
        val lastChunk = when(n <= window, lit(0L)).otherwise(
          floor((n - lit(window) + lit(stride - 1)).cast("double") /
            lit(stride.toDouble)).cast("long"))
        transform(sequence(lit(0L), lastChunk), i => {
          val start = i * stride
          val len = least(lit(window.toLong), n - start)
          struct(i.as("chunk_id"), start.as("start_token"),
            len.cast("long").as("n_tokens"),
            array_join(slice(toks, (start + 1).cast("int"), len.cast("int")),
              " ").as("chunk_text"))
        })
      })
    docs.select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.start_token"),
        col("c.n_tokens"), col("c.chunk_text"))
  }
}
