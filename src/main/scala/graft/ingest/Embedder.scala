package graft.ingest

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Batched embedding (SURVEY §2.2 I3; reference src/app.py:205-219 runs
  * sentence-transformers over batches of 100 texts).
  *
  * Embedding parity with the reference's torch model is impossible offline
  * and unnecessary (SURVEY §7.4 item 1): operators take vectors as data.
  * The `Embedder` trait is the pluggable seam a real model plugs into (an
  * ONNX/JNI encoder at scale); [[HashingEmbedder]] is the deterministic,
  * dependency-free default used for tests and text→vector queries.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed one batch of texts; must be deterministic for a given input. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Term-hashing featurizer: md5-bucketed term counts, L2-normalized.
  * md5 (not JVM hashCode) so the mapping is stable across JVMs/engines. */
final class HashingEmbedder(val dim: Int = 64) extends Embedder {
  private def bucket(token: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    // first 4 bytes as unsigned int mod dim
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (h % dim).toInt
  }

  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    // Locale.ROOT: default-locale lowercasing is JVM-dependent (Turkish
    // dotless-i etc.) and would diverge from DuckDB's lower() — and
    // between executors with different default locales
    t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
      .foreach(tok => v(bucket(tok)) += 1.0f)
    val norm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x)).toFloat
    if (norm > 0f) v.map(_ / norm) else v
  }
}

/** Per-partition MODEL SESSION seam — the shape a real in-process
  * encoder needs (reference src/app.py:219 runs a sentence-transformers
  * model in process; at scale that is an ONNX Runtime `OrtSession` or a
  * JNI handle): the session object is NOT serializable, so what ships
  * to executors is a FACTORY; each partition instantiates its session
  * ONCE, feeds it bounded batches, and closes it when the partition
  * drains. An ONNX twin is `() => new SessionEncoder { val env =
  * OrtEnvironment...; def encode(ts) = run the session on the tokenized
  * batch; def close() = session.close() }` — the Spark-side plumbing
  * (lifecycle, batch shape, schema) is exactly what
  * [[Embed.withEmbeddingsSession]] runs and the spec pins. */
trait SessionEncoder extends AutoCloseable {
  def dim: Int
  /** Encode one bounded batch; deterministic per input, and must not
    * depend on how rows were batched (batch-boundary invariance — the
    * spec's pin). */
  def encode(texts: Seq[String]): Seq[Array[Float]]
  override def close(): Unit = ()
}

object Embed {
  /** I3/I4: append an embedding column computed in batches of `batchSize`
    * per partition (reference batch size 100, src/app.py:205). The
    * `mapPartitions` + `grouped` shape is the idiomatic Spark seam for a
    * model call: per-executor batching, no driver round-trips, scales
    * linearly with partitions. */
  def withEmbeddings(df: DataFrame, textCol: String, outCol: String,
                     embedder: Embedder, batchSize: Int = 100): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embed(batch.map(r =>
          Option(r.getString(textIdx)).getOrElse("")))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** [[withEmbeddings]] for NON-SERIALIZABLE encoders (ONNX/JNI): the
    * factory ships, the session lives per partition — instantiated
    * lazily on the first row (empty partitions pay nothing), fed
    * `batchSize`d slices, `close()`d exactly once however the task
    * ends. The drain path closes eagerly; a TaskCompletionListener
    * backstops the cases the iterator never reaches exhaustion — a
    * downstream limit abandoning the partition mid-way, or encode()
    * throwing — so a reused executor JVM cannot leak native sessions.
    * Same schema/batch contract as [[withEmbeddings]]; a session must
    * return one vector per input row or the partition fails loudly. */
  def withEmbeddingsSession(df: DataFrame, textCol: String,
                            outCol: String,
                            makeSession: () => SessionEncoder,
                            batchSize: Int = 100): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val session = makeSession()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; session.close() }
        // backstop for partial consumption (limit) and mid-batch failure
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val rows = it.grouped(batchSize).flatMap { batch =>
          val vecs = session.encode(batch.map(r =>
            Option(r.getString(textIdx)).getOrElse("")))
          require(vecs.length == batch.length,
            s"session encoder returned ${vecs.length} vectors for a " +
              s"${batch.length}-row batch")
          batch.iterator.zip(vecs.iterator).map { case (r, v) =>
            Row.fromSeq(r.toSeq :+ v.toSeq)
          }
        }
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) closeOnce()
            h
          }
          override def next(): Row = rows.next()
        }
      }
    }(Encoders.row(schema))
  }
}
