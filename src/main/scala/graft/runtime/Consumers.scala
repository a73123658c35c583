package graft.runtime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Change-log CONSUMER REGISTRY — the collapse boundary derived from
  * the consumers instead of trusted from the caller. Before this,
  * [[ChangeLog.checkpoint]] folded wherever it was told: a watermark
  * computed without knowing about some laggard [[MaterializedView]]
  * silently collapsed the entries the view still owed a read, and the
  * view's next refresh failed loud with "re-seed from a snapshot" —
  * correct, but a full-recompute bill an operational mistake should
  * not be able to incur. The reference guards its Silver consumers
  * with the same move in reverse: a snapshot-lineage validity walk
  * before each incremental hop (`airflow/dags/silver_dag.py:65-88`).
  *
  * Each consumer of a table's log registers its POSITION — the
  * highest `batch_id` it has fully applied — under a stable name in a
  * `_consumers` sibling directory of the log (a sibling, never inside
  * the log root: the log's first publish `mode("overwrite")`s that
  * root). [[ChangeLog.checkpoint]] then clamps every requested fold
  * to `min` over registered positions, so a laggard BLOCKS the
  * collapse at its position and the fold proceeds exactly as far as
  * the slowest consumer allows. [[MaterializedView.refresh]]
  * registers automatically after each committed refresh; a custom
  * tail (a [[ChangeLog.stream]] consumer, a downstream job on
  * [[ChangeLog.readSince]]) calls [[register]] itself after each
  * applied span — the position it registers is the watermark it
  * would pass to `readSince` next time.
  *
  * A registration may carry the consumer's VIEW DIRECTORY: that is
  * the hook compliance ops need to reach the consumer's STATE —
  * [[Forget.forgetUser]] invalidates each registered view of a log
  * it purges (the view's aggregates were computed from row images
  * that no longer exist), and the view's next refresh re-seeds from
  * the purged base instead of serving stale personal-data-derived
  * numbers.
  *
  * Scale shape: one tiny file per consumer, read by listing one
  * directory — metadata-scale, no data path touches it. Registration
  * is atomic (temp + rename, the watermark-file protocol), written
  * AFTER the consumer's own state commits: a crash between the two
  * leaves the registry one refresh behind — conservative for the
  * collapse (it folds less), never unsafe. */
object Consumers {

  /** The registry of the log of the table at `tableDir`. */
  def dir(tableDir: String): String =
    ChangeLog.logDir(tableDir) + "_consumers"

  /** One registered consumer: position = highest applied batch_id;
    * viewDir = the consumer's state directory, when it has one. */
  case class Registration(name: String, position: Long,
                          viewDir: Option[String])

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def validName(name: String): Boolean =
    name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.')

  /** Register (or advance) consumer `name` at `position` — call AFTER
    * the span up to `position` is durably applied to the consumer's
    * own state. Idempotent; re-registering the same position is a
    * cheap no-op. Positions may also move BACKWARD deliberately (a
    * consumer restored from an older checkpoint re-registers lower,
    * and the collapse respects it). */
  def register(spark: SparkSession, tableDir: String, name: String,
               position: Long, viewDir: Option[String] = None): Unit = {
    require(validName(name),
      s"consumer name '$name' must be a non-empty [A-Za-z0-9_.-]+ " +
        "token (it names the registry file)")
    if (read(spark, tableDir, name)
          .contains(Registration(name, position, viewDir))) return
    val p = new Path(dir(tableDir), name)
    val tmp = new Path(dir(tableDir), name + ".tmp")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(
      (position.toString + "\n" + viewDir.getOrElse("")).getBytes("UTF-8"))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    f.rename(tmp, p)
  }

  /** Drop consumer `name` from the registry — a retired consumer must
    * unregister, or its last position pins the collapse forever. */
  def unregister(spark: SparkSession, tableDir: String,
                 name: String): Unit = {
    val p = new Path(dir(tableDir), name)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, false)
  }

  private def read(spark: SparkSession, tableDir: String,
                   name: String): Option[Registration] = {
    val p = new Path(dir(tableDir), name)
    val f = fs(spark, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val text =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8")
      } finally in.close()
    val lines = text.split("\n", 2)
    lines.headOption.flatMap(_.trim.toLongOption).map { pos =>
      val vd = lines.lift(1).map(_.trim).filter(_.nonEmpty)
      Registration(name, pos, vd)
    }
  }

  /** Every registered consumer of the table's log. Registrations land
    * by atomic rename, so a partial file is unreachable in practice; a
    * hand-damaged file fails loud here rather than being silently
    * dropped from the [[minPosition]] clamp. */
  def list(spark: SparkSession, tableDir: String): Seq[Registration] = {
    val d = new Path(dir(tableDir))
    val f = fs(spark, d)
    if (!f.exists(d)) return Seq.empty
    f.listStatus(d).toIndexedSeq
      .filter(st => st.isFile && !st.getPath.getName.endsWith(".tmp"))
      .map { st =>
        val n = st.getPath.getName
        read(spark, tableDir, n).getOrElse(sys.error(
          s"unreadable consumer registration ${st.getPath}: fix or " +
            "remove it — silently ignoring it would let the collapse " +
            "fold past this consumer's position"))
      }
      .sortBy(_.name)
  }

  /** The collapse clamp: the minimum position across registered
    * consumers, or None when none are registered (the caller's
    * watermark then stands alone, the pre-registry discipline). */
  def minPosition(spark: SparkSession, tableDir: String): Option[Long] =
    list(spark, tableDir).map(_.position).minOption
}
