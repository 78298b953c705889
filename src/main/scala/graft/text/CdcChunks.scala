package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the shift-tolerant dedup unit.
  * Fixed-size chunking breaks when one byte is inserted (every later
  * chunk shifts); CDC instead places boundaries where the CONTENT of a
  * sliding window hits a hash criterion, so an edit only disturbs the
  * chunks it touches and identical passages in different documents chunk
  * identically — letting chunk-level dedup (group by chunk hash) find
  * shared boilerplate that document-level fingerprints miss.
  *
  * Pinned semantics (mirrored 1:1 in the DuckDB oracle):
  *   - window w = 8 chars, 1-based positions;
  *   - boundary AFTER position i (i ∈ [w, L]) iff
  *     md5(text[i-w+1 .. i]) starts with hex nibble '0'  (p = 1/16 →
  *     expected chunk ≈ 16 chars);
  *   - the document end always closes the final chunk;
  *   - chunk identity = md5 of the chunk text.
  *
  * The chunker is the codegen'd [[graft.functions.CdcChunkList]] kernel —
  * one compiled pass and one md5 per window position. (The equivalent
  * higher-order-function formulation re-evaluates the O(L)-md5 boundary
  * array at every lambda reference — Catalyst inlines expression trees —
  * and profiled at ~1 s/document; the DuckDB oracle still computes the
  * list formulation, which is exactly what pins the kernel's semantics.)
  * Per-row map work only; no shuffle.
  */
object CdcChunks {
  val Window = 8

  /** Exploded chunk inventory: (id, chunk_no, chunk_len, chunk_md5). */
  def chunks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.TextFunctions.cdcChunkList(
          col(textCol), Window)).as("c"))
      .select(col(idCol), col("c.chunk_no"), col("c.chunk_len"),
        col("c.chunk_md5"))
}
