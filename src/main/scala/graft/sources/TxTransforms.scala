package graft.sources

import org.apache.spark.sql.{Column, functions}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType, TimestampType}

/** Iceberg-style HIDDEN PARTITIONING for the tx table: `PARTITIONED BY
  * (bucket(8, id), days(ts), truncate(4, name))` records a TRANSFORM
  * per partition field; partition VALUES are derived from the source
  * column at stage time and live only in file paths (+ min=max stats
  * entries keyed by the derived field name) — the source column stays
  * in file bytes, the derived one never enters the logical schema, and
  * a reader never has to know the layout to query correctly (the
  * hidden-partitioning contract).
  *
  * What each transform buys at 100 TB:
  *  - `bucket(n, col)`: storage-partitioned joins — two tables
  *    bucketed the same way join with ZERO shuffle (the scan reports
  *    `KeyGroupedPartitioning(bucket(n, col))`, no manually
  *    materialized bucket column), and point lookups prune to one
  *    bucket via the projected equality.
  *  - `days(ts)`: time-partitioned event tables — a `ts` range
  *    predicate prunes whole day directories through the projected
  *    day bounds, no manual date column.
  *  - `truncate(n, col)`: prefix layouts — equality (and >= n-long
  *    prefix) predicates prune on the truncated value.
  *
  * PREDICATE PROJECTION (the Iceberg `Projections` idea): a filter on
  * the SOURCE column conservatively implies a filter on the DERIVED
  * value, which the existing stats-skipping layer evaluates against
  * the path-derived min=max entries. Projections are sound-only —
  * a shape with no projection simply prunes nothing.
  *
  * Determinism notes (what makes path values trustworthy):
  *  - bucket uses Spark's Murmur3 (`hash()`, seed 42) pmod n — a pure
  *    function of the int/long value, identical on driver and
  *    executors, every JVM.
  *  - days is `floor(epoch-seconds / 86400)` — explicitly UTC-fixed
  *    (never the session-timezone `cast(ts as date)`, whose value
  *    changes with configuration — a layout must not lie when the
  *    session moves).
  *  - truncate is codepoint `substring(1, n)` on strings.
  * Anything else (floats, session-dependent or non-deterministic
  * expressions) refuses loudly at declaration.
  */
private[graft] object TxTransforms {

  /** One partition field: `name` is the derived column as it appears
    * in paths and stats keys; identity fields have name == source. */
  final case class PartitionField(name: String, transform: String,
                                  source: String) {
    def isIdentity: Boolean = transform == "identity"
  }

  private val Bucket = """bucket\[(\d+)\]""".r
  private val Truncate = """truncate\[(\d+)\]""".r

  /** Manifest wire form: "name=transform(source)" per non-identity
    * field, e.g. "id_bucket=bucket[8](id)". */
  def encode(f: PartitionField): String =
    s"${f.name}=${f.transform}(${f.source})"

  private val Enc = """([^=]+)=([a-z]+\[?\d*\]?)\(([^)]+)\)""".r
  def decode(s: String): PartitionField = s match {
    case Enc(n, t, src) => PartitionField(n, t, src)
    case other => throw new IllegalArgumentException(
      s"unparseable partition transform '$other'")
  }

  /** The manifest's full field spec: every partition column name,
    * with its transform when the transforms map declares one (map
    * values are the "transform(source)" half of the wire form). */
  def spec(m: TxTable.Manifest): Seq[PartitionField] =
    m.partitionColumns.map { n =>
      m.partitionTransforms.get(n).map(v => decode(s"$n=$v"))
        .getOrElse(PartitionField(n, "identity", n))
    }

  /** The map entry for a non-identity field. */
  def encodeValue(f: PartitionField): String =
    s"${f.transform}(${f.source})"

  /** Identity partition column names — the ones that are REAL schema
    * columns (readers attach their values; derived fields are hidden
    * and their sources live in file bytes). */
  def identityNames(m: TxTable.Manifest): Seq[String] =
    spec(m).filter(_.isIdentity).map(_.name)

  /** The derived column expression staged before the partitioned
    * write. Also validates the source's type against the transform. */
  def deriveColumn(f: PartitionField, schema: StructType): Column = {
    require(schema.fieldNames.contains(f.source),
      s"partition transform ${f.transform} references missing column " +
        s"'${f.source}' in ${schema.simpleString}")
    val st = schema(f.source).dataType
    val c = functions.col(f.source)
    f.transform match {
      case "identity" => c
      case Bucket(n) =>
        require(st == LongType || st == IntegerType,
          s"bucket(${f.source}) needs an int/long source, got " +
            st.simpleString)
        functions.when(c.isNull, functions.lit(null))
          .otherwise(functions.pmod(functions.hash(c),
            functions.lit(n.toInt)))
      case "days" =>
        require(st == TimestampType,
          s"days(${f.source}) needs a timestamp source, got " +
            st.simpleString)
        // UTC-fixed: epoch seconds / 86400, floored — never the
        // session-timezone date cast
        functions.floor(c.cast("long") / 86400).cast("int")
      case Truncate(n) =>
        require(st == StringType,
          s"truncate(${f.source}) needs a string source, got " +
            st.simpleString)
        functions.when(c.isNull, functions.lit(null))
          .otherwise(c.substr(1, n.toInt))
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform '$other' — supported: " +
          "identity, bucket[n], days, truncate[n]")
    }
  }

  /** The derived value's type (what path strings parse back as). */
  def derivedType(f: PartitionField, schema: StructType): DataType =
    f.transform match {
      case "identity" => schema(f.name).dataType
      case Bucket(_) => IntegerType
      case "days" => IntegerType
      case Truncate(_) => StringType
    }

  // ------------------------- driver-side transform value computation

  /** Spark's `hash()` for one int/long value (Murmur3, seed 42) —
    * must agree bit-for-bit with the staged column expression. */
  private def sparkHash(v: Any): Option[Int] = v match {
    case l: Long => Some(org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashLong(l, 42))
    case i: Int => Some(org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashInt(i, 42))
    case i: java.lang.Integer => Some(org.apache.spark.unsafe.hash
      .Murmur3_x86_32.hashInt(i, 42))
    case l: java.lang.Long => Some(org.apache.spark.unsafe.hash
      .Murmur3_x86_32.hashLong(l, 42))
    case _ => None
  }

  private def bucketOf(v: Any, n: Int): Option[Int] =
    sparkHash(v).map(h => ((h % n) + n) % n)

  /** Epoch day of a pushed timestamp literal (UTC, floor) — the same
    * arithmetic as the staged `floor(epoch-seconds / 86400)` — plus
    * whether the literal sits EXACTLY on a day boundary (midnight,
    * zero sub-second): `ts < midnight-of-day-d` implies `day <= d-1`,
    * one whole directory sharper than the generic `day <= d`. */
  private def dayAndBoundary(v: Any): Option[(Int, Boolean)] = {
    val parts: Option[(Long, Long)] = v match {
      case t: java.sql.Timestamp =>
        Some((Math.floorDiv(t.getTime, 1000L), t.getNanos.toLong))
      case i: java.time.Instant =>
        Some((i.getEpochSecond, i.getNano.toLong))
      case _ => None
    }
    parts.map { case (sec, nanos) =>
      (Math.floorDiv(sec, 86400L).toInt,
        Math.floorMod(sec, 86400L) == 0L && nanos == 0L)
    }
  }

  private def dayOf(v: Any): Option[Int] = dayAndBoundary(v).map(_._1)

  /** Project a source-column filter onto the derived partition values:
    * extra conjuncts keyed by the derived field NAME, evaluated by the
    * stats layer against the path min=max entries. Sound-only — an
    * unprojectable shape adds nothing. */
  def projectFilter(f: org.apache.spark.sql.sources.Filter,
                    fields: Seq[PartitionField])
      : Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    fields.filterNot(_.isIdentity).flatMap { pf =>
      (pf.transform, f) match {
        case (Bucket(n), EqualTo(a, v)) if a == pf.source =>
          bucketOf(v, n.toInt).map(b => EqualTo(pf.name, b)).toSeq
        case (Bucket(n), In(a, vs)) if a == pf.source && vs != null &&
            vs.nonEmpty && vs.forall(_ != null) =>
          val bs = vs.toSeq.map(v => bucketOf(v, n.toInt))
          if (bs.forall(_.isDefined))
            Seq(In(pf.name, bs.flatten.distinct.map(b => b: Any).toArray))
          else Nil
        case ("days", EqualTo(a, v)) if a == pf.source =>
          dayOf(v).map(d => EqualTo(pf.name, d)).toSeq
        case ("days", GreaterThan(a, v)) if a == pf.source =>
          dayOf(v).map(d => GreaterThanOrEqual(pf.name, d)).toSeq
        case ("days", GreaterThanOrEqual(a, v)) if a == pf.source =>
          dayOf(v).map(d => GreaterThanOrEqual(pf.name, d)).toSeq
        case ("days", LessThan(a, v)) if a == pf.source =>
          dayAndBoundary(v).map { case (d, boundary) =>
            LessThanOrEqual(pf.name, if (boundary) d - 1 else d)
          }.toSeq
        case ("days", LessThanOrEqual(a, v)) if a == pf.source =>
          dayOf(v).map(d => LessThanOrEqual(pf.name, d)).toSeq
        case (Truncate(n), EqualTo(a, v: String)) if a == pf.source =>
          Seq(EqualTo(pf.name, v.take(n.toInt)))
        case (Truncate(n), StringStartsWith(a, p))
            if a == pf.source && p != null && p.length >= n.toInt =>
          Seq(EqualTo(pf.name, p.take(n.toInt)))
        case _ => Nil
      }
    }
  }

  /** Augment a skip-filter list with its transform projections. */
  def withProjections(filters: Seq[org.apache.spark.sql.sources.Filter],
                      m: TxTable.Manifest)
      : Seq[org.apache.spark.sql.sources.Filter] =
    if (m.partitionTransforms.isEmpty) filters
    else filters ++ filters.flatMap(projectFilter(_, spec(m)))

  /** The schema the STATS layer evaluates against: the table schema
    * plus one typed field per hidden partition field, so a projected
    * filter on a derived name can be compared against its path-derived
    * min=max entries (TxStats.excludes types values by schema lookup —
    * an untypeable column never prunes). */
  def skipSchema(schema: StructType,
                 fields: Seq[PartitionField]): StructType = {
    val hidden = fields.filterNot(_.isIdentity)
    if (hidden.isEmpty) schema
    else StructType(schema.fields ++ hidden.map(f =>
      org.apache.spark.sql.types.StructField(f.name,
        derivedType(f, schema), nullable = true)))
  }

  def skipSchema(schema: StructType, m: TxTable.Manifest): StructType =
    skipSchema(schema, spec(m))

  /** The DSv2 transform expression the scan reports for SPJ / the
    * table advertises via `partitioning()`. */
  def v2Transform(f: PartitionField)
      : org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.{Expressions => E}
    f.transform match {
      case "identity" => E.identity(f.name)
      case Bucket(n) => E.bucket(n.toInt, f.source)
      case "days" => E.days(f.source)
      case Truncate(n) =>
        E.apply("truncate", E.literal(Int.box(n.toInt)),
          E.column(f.source))
    }
  }

  /** Parse SQL `PARTITIONED BY` transforms into partition fields —
    * the TxCatalog CREATE hook. Refuses unknown/unsupported shapes
    * loudly rather than silently ignoring a layout clause. */
  def fromV2(transforms: Seq[
      org.apache.spark.sql.connector.expressions.Transform])
      : Seq[PartitionField] = {
    def oneRef(t: org.apache.spark.sql.connector.expressions.Transform)
        : String = {
      require(t.references().length == 1 &&
          t.references()(0).fieldNames().length == 1,
        s"partition transform $t must reference one top-level column")
      t.references()(0).fieldNames()(0)
    }
    transforms.map { t =>
      t.name() match {
        case "identity" =>
          val c = oneRef(t); PartitionField(c, "identity", c)
        case "bucket" =>
          val c = oneRef(t)
          val n = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_]
                if l.value().isInstanceOf[Number] =>
              l.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            s"bucket transform $t carries no numeric width"))
          require(n >= 1, s"bucket width must be >= 1, got $n")
          PartitionField(s"${c}_bucket", s"bucket[$n]", c)
        case "days" =>
          val c = oneRef(t)
          PartitionField(s"${c}_day", "days", c)
        case "truncate" =>
          val c = oneRef(t)
          val n = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_]
                if l.value().isInstanceOf[Number] =>
              l.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            s"truncate transform $t carries no numeric width"))
          require(n >= 1, s"truncate width must be >= 1, got $n")
          PartitionField(s"${c}_trunc", s"truncate[$n]", c)
        case other => throw new UnsupportedOperationException(
          s"unsupported PARTITIONED BY transform '$other' — supported: " +
            "identity columns, bucket(n, col), days(ts), " +
            "truncate(n, col); years/months/hours need a days-grain " +
            "relayout, arbitrary expressions are not a deterministic " +
            "layout")
      }
    }
  }
}
