package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate. Ordering: higher score first, lower id breaks
  * ties (matches `ORDER BY score DESC, id` everywhere else). */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k typed aggregate — the custom-operator path (SURVEY.md
  * §7.3) for "top k by score per group" without a window sort.
  *
  * Why not `row_number().over(Window.partitionBy(q).orderBy(score))`?
  * The window shuffles and SORTS every scored row (O(N log N) per
  * partition, all N rows cross the wire). This aggregator is a classic
  * bounded-heap: partial aggregation keeps at most k rows per group per
  * map task, so only `k × groups × tasks` rows shuffle — at a
  * 100 TB scoring pass that is the difference between a terabyte-scale
  * sort and kilobytes of heap merges.
  *
  * The buffer is a sorted Vector (k is small); insertion is O(k) with
  * early reject of rows worse than the current k-th.
  */
final class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.size
        case j => j
      }
      val withX = (buf.take(i) :+ x) ++ buf.drop(i)
      if (withX.size > k) withX.take(k) else withX
    }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = insert(b, a)
  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    y.foldLeft(x)(insert)
  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

/** One scored string key. Ordering: higher score first, LEXICOGRAPHICALLY
  * smaller key breaks ties (`ORDER BY score DESC, key`). */
final case class ScoredKey(score: Double, key: String)

/** String-keyed sibling of [[TopKByScore]] — same bounded heap, for
  * "top k tokens by score per document" shapes (tfidf keywords): the
  * window-sort form shuffled AND sorted every term row (measured as the
  * whole 16× growth of q58 — 3.1 s of a 4.4 s plan); the heap shuffles
  * at most k × groups × tasks rows and sorts nothing. */
final class TopKByScoreStr(k: Int) extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {

  private def better(a: ScoredKey, b: ScoredKey): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  private def insert(buf: Seq[ScoredKey], x: ScoredKey): Seq[ScoredKey] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.size
        case j => j
      }
      val withX = (buf.take(i) :+ x) ++ buf.drop(i)
      if (withX.size > k) withX.take(k) else withX
    }

  override def zero: Seq[ScoredKey] = Vector.empty
  override def reduce(b: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] = insert(b, a)
  override def merge(x: Seq[ScoredKey], y: Seq[ScoredKey]): Seq[ScoredKey] =
    y.foldLeft(x)(insert)
  override def finish(b: Seq[ScoredKey]): Seq[ScoredKey] = b
  override def bufferEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredKey]] = ExpressionEncoder()
}

object TopKByScore {
  /** Column form: `topK(k)(scoreCol, idCol)` → `array<struct<score,id>>`
    * already sorted best-first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScore(k))
    (score, id) => fn(score, id)
  }

  /** Column form over string keys: `topKStr(k)(scoreCol, keyCol)` →
    * `array<struct<score,key>>` sorted best-first (ties on key asc). */
  def topKStr(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScoreStr(k))
    (score, key) => fn(score, key)
  }

  /** Rank-exploded convenience: (groupCols..., id, score, rank<=k). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(topK(k)(col(scoreCol), col(idCol)).as("__topk"))
      .select(groupCols.map(col) :+ posexplode(col("__topk")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__e.id").as(idCol), col("__e.score").as(scoreCol),
        (col("__pos") + 1).as("rank")): _*)
}
