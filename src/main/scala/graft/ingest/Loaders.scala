package graft.ingest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources + ingest parsers (SURVEY §2.1 S1-S4, §2.2 I7).
  *
  * Pinned reference semantics:
  *  - S1: CSV with header (pandas read_csv, src/app.py:156-159);
  *  - S2: chapter column = first column whose lowercase name contains
  *    "chapter"/"章节"; content column = name contains "content"/"内容"/
  *    "knowledge"; fallback: first two columns (src/app.py:163-175);
  *  - S3: drop rows with null/empty content (src/app.py:178);
  *  - S4: hardcoded example fallback when the CSV is absent/empty
  *    (src/app.py:131-134, 144-154) — same (chapter, content) shape,
  *    engine-local sample rows;
  *  - I7: chapter-block text parser (src/app.py:549-599): a trimmed line
  *    matching `第[零一二三四五六七八九十百千]+章` at start OR containing
  *    "章节" opens a new block whose chapter is the whole line; other
  *    non-empty lines append to the block's content joined by " "; blocks
  *    with no content are dropped; lines before the first marker are
  *    dropped.
  */
object Loaders {
  /** S4 fallback rows (reference-shaped sample; src/app.py:144-154). */
  val ExampleRows: Seq[(String, String)] = Seq(
    ("第一章 引言", "数据库系统是管理大规模结构化数据的核心软件基础设施。"),
    ("第一章 引言", "数据模型经历了层次、网状、关系与新一代系统的演变。"),
    ("第二章 关系模型", "关系模型由数据结构、操作集合和完整性约束组成。"),
    ("第二章 关系模型", "关系操作包括选择、投影、连接等查询以及插入、删除、修改。"),
    ("第三章 规范化", "不合适的数据依赖会导致冗余和更新、插入、删除异常。"))

  /** S2: resolve (chapterCol, contentCol) by name heuristic. */
  def detectColumns(columns: Seq[String]): (String, String) = {
    def findCol(keys: Seq[String]): Option[String] =
      columns.find(c => keys.exists(k => c.toLowerCase.contains(k)))
    val chapter = findCol(Seq("chapter", "章节"))
    val content = findCol(Seq("content", "内容", "knowledge"))
    (chapter, content) match {
      case (Some(ch), Some(co)) => (ch, co)
      case _ if columns.length >= 2 => (columns(0), columns(1))
      case _ => throw new IllegalArgumentException(
        s"cannot detect chapter/content columns in ${columns.mkString(",")}")
    }
  }

  /** S1+S2+S3: header CSV scan, column auto-detect, non-empty filter.
    * Falls back to [[ExampleRows]] when the path is unreadable or empty. */
  def loadKnowledgeCsv(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fallback = ExampleRows.toDF("chapter", "content")
    try {
      // multiLine: a quoted content cell may legitimately contain
      // newlines (Spark's own CSV writer quotes them); default
      // single-line mode would silently shred such a record into garbage
      // rows instead of reading it back
      val raw = spark.read.option("header", "true")
        .option("multiLine", "true").csv(path)
      val (ch, co) = detectColumns(raw.columns.toSeq)
      val df = raw.select(col(ch).as("chapter"), col(co).as("content"))
        .where(col("content").isNotNull && col("content") =!= "")
      if (df.isEmpty) fallback else df
    } catch {
      case _: Exception => fallback
    }
  }

  val ChapterLinePattern: String = "^第[零一二三四五六七八九十百千]+章"

  /** I7: parse `(line_no, line)` rows into `(block_id, chapter, content)`.
    *
    * Uses a single global running window (marker count + last-marker
    * carry-forward) — correct for the pasted-text sizes this models; for
    * huge documents the same plan works per-document by adding the doc id
    * to the partition keys. */
  def parseChapterBlocks(lines: DataFrame): DataFrame =
    parseChapterBlocks(lines, docCol = None)

  /** Per-document form: when `docCol` is set, the running windows
    * partition by it — the same plan sharded across documents, which is
    * the shape that scales (one global ordering only exists for a single
    * pasted text). */
  def parseChapterBlocks(lines: DataFrame, docCol: Option[String]): DataFrame = {
    val base = docCol match {
      case Some(d) => Window.partitionBy(col(d))
      case None    => Window.partitionBy()
    }
    val w = base.orderBy(col("line_no").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isMarker = col("line").rlike(ChapterLinePattern) ||
      col("line").contains("章节")
    lines
      .withColumn("line", trim(col("line")))
      .where(col("line") =!= "")
      .withColumn("is_marker", when(isMarker, 1).otherwise(0))
      .withColumn("block_id", sum(col("is_marker")).over(w).cast("long"))
      .withColumn("chapter",
        last(when(col("is_marker") === 1, col("line")), ignoreNulls = true).over(w))
      .where(col("is_marker") === 0 && col("chapter").isNotNull)
      .groupBy((docCol.map(col).toSeq :+ col("block_id")) :+ col("chapter"): _*)
      .agg(trim(array_join(
        transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
          x => x.getField("line")),
        " ")).as("content"))
  }
}
