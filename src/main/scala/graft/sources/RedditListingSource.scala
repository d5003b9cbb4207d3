package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/** DataSource V2 `TableProvider` for the reddit listing format
  * (SURVEY §2.1 S1's optional "reddit" connector): one registered
  * format, `spark.read.format("reddit-listing").load(path)`, yielding
  * one ALREADY-EXPLODED row per post with the canonical ingest schema —
  * the nested-JSON handling (`data.children[].data`) lives inside the
  * connector, like the reference's `_fetch_last_posts` projection
  * (/root/reference/dags/Fetch_reddit.py:140-171).
  *
  * Layout: one `InputPartition` per listing file (a listing page is one
  * API response — parallelism across pages, never within one), reader
  * streams posts without materializing the page twice. With
  * `mode=online` (+ `subreddit`, optional `clientId`/`clientSecret` and
  * endpoint overrides) the partition fetches the page over HTTP through
  * the full OAuth + retry state machine ([[RedditHttp]]) instead of
  * reading a file — same parser, same schema, same plan shape.
  */
class RedditListingSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "reddit-listing"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RedditListingSource.PostSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ListingTable(properties.asScala.toMap)
}

object RedditListingSource {

  /** Exploded post schema (Fetch_reddit.py:140-166 field set). */
  val PostSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("id", StringType),
    StructField("created_utc", DoubleType),
    StructField("score", LongType),
    StructField("num_comments", LongType),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("permalink", StringType),
    StructField("subreddit", StringType),
    StructField("link_flair_text", StringType)))

  /** String-typed post fields eligible for equality-filter pushdown. */
  val StringFields: Set[String] = PostSchema.fields
    .collect { case f if f.dataType == StringType => f.name }.toSet
}

private class ListingTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"reddit_listing(${props.getOrElse("path", "?")})"
  override def schema(): StructType = RedditListingSource.PostSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ListingScanBuilder(options.asScala.toMap ++ props)
}

private class ListingScanBuilder(options: Map[String, String])
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  // DSv2 limit pushdown: a query-level LIMIT becomes a per-page cap the
  // reader enforces while streaming the JSON — pages stop parsing at n
  // posts instead of materializing the full listing.
  private var pushedLimit: Option[Int] = None
  // DSv2 column pruning: the reader materializes ONLY the projected
  // fields from each post object (a 2-column projection never builds
  // the other 8 values).
  private var required: StructType = RedditListingSource.PostSchema
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true // fully pushed per partition; Spark still applies the global limit
  }
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // DSv2 filter pushdown: string-equality predicates on post fields are
  // evaluated while streaming the page, so filtered-out posts are never
  // materialized into rows. Everything else stays a Spark-side filter.
  private var accepted: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (ok, rest) = filters.partition {
      case org.apache.spark.sql.sources.EqualTo(att, _: String)
        if RedditListingSource.StringFields(att) => true
      case _ => false
    }
    accepted = ok
    rest
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = accepted
  override def build(): Scan = {
    val eq = accepted.collect {
      case org.apache.spark.sql.sources.EqualTo(att, v: String) => att -> v
    }.toMap
    new ListingScan(options, pushedLimit, required, eq)
  }
}

private class ListingScan(
    options: Map[String, String],
    pushedLimit: Option[Int] = None,
    schema: StructType = RedditListingSource.PostSchema,
    eqFilters: Map[String, String] = Map.empty) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"reddit-listing pushedLimit=${pushedLimit.getOrElse(-1)} " +
      s"cols=${schema.fieldNames.mkString(",")} " +
      s"eq=[${eqFilters.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    if (options.get("mode").contains("online")) {
      // Online path (S1 live + S2 OAuth, behind the `mode=online` flag):
      // one partition per requested subreddit — a listing page is one
      // API response, same parallelism story as one partition per file.
      val subs = options.getOrElse("subreddit",
        throw new IllegalArgumentException(
          "reddit-listing mode=online requires a subreddit option"))
      subs.split(",").map(_.trim).filter(_.nonEmpty)
        .map(s => HttpListingPartition(s, options): InputPartition)
    } else {
      val path = options.getOrElse("path",
        throw new IllegalArgumentException("reddit-listing requires a path"))
      val p = new Path(path)
      val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted
        else Array(path)
      files.map(f => ListingPartition(f): InputPartition)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new ListingReaderFactory(math.min(
      options.getOrElse("limit", Int.MaxValue.toString).toInt,
      pushedLimit.getOrElse(Int.MaxValue)), schema, eqFilters)
}

private case class ListingPartition(file: String) extends InputPartition

private case class HttpListingPartition(
    subreddit: String, options: Map[String, String]) extends InputPartition

private class ListingReaderFactory(
    limit: Int, schema: StructType, eqFilters: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ListingPartition(file) =>
        new ListingPartitionReader(
          ListingPartitionReader.readFile(file), limit, schema, eqFilters)
      case HttpListingPartition(sub, opts) =>
        // Executor-side fetch through the full OAuth + retry state
        // machine (RedditHttp); the raw page body feeds the SAME
        // parser as the file path.
        val cfg = RedditHttp.Config(
          clientId = opts.get("clientid"),
          clientSecret = opts.get("clientsecret"),
          userAgent = opts.getOrElse("useragent", "graft/0.1"),
          tokenUrl = opts.getOrElse("tokenurl",
            "https://www.reddit.com/api/v1/access_token"),
          oauthApiBase = opts.getOrElse("oauthapibase", "https://oauth.reddit.com"),
          publicApiBase = opts.getOrElse("publicapibase", "https://www.reddit.com"))
        val client = new RedditHttpClient(cfg, RedditHttp.JdkHttpTransport)
        new ListingPartitionReader(
          client.fetchListingJson(sub, limit), limit, schema, eqFilters)
    }
}

private object ListingPartitionReader {
  def readFile(file: String): String = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}

/** Streams one listing page's `data.children[].data` posts. Null-safe
  * exactly like the reference's `.get()` chains: absent/mistyped
  * fields become null.
  */
private class ListingPartitionReader(
    text: String, limit: Int,
    schema: StructType = RedditListingSource.PostSchema,
    eqFilters: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {

  // pushed equality predicates run BEFORE the per-post limit, matching
  // WHERE-then-LIMIT semantics
  private def matches(d: JValue): Boolean = eqFilters.forall { case (f, v) =>
    d \ f match {
      case JString(s) => s == v
      case _ => false
    }
  }

  private val posts: Iterator[JValue] = {
    JsonMethods.parse(text) \ "data" \ "children" match {
      case JArray(children) =>
        children.iterator.map(_ \ "data").filter(matches).take(limit)
      case _ => Iterator.empty
    }
  }

  private var current: InternalRow = _

  private def str(jv: JValue): UTF8String = jv match {
    case JString(s) => UTF8String.fromString(s)
    case _ => null
  }

  private def dbl(jv: JValue): Any = jv match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case _ => null
  }

  private def lng(jv: JValue): Any = jv match {
    case JInt(i) => i.toLong
    case JDouble(d) => d.toLong
    case JDecimal(d) => d.toLong
    case _ => null
  }

  // per-field extractor honoring the pruned schema (only projected
  // fields are ever materialized)
  private def value(d: JValue, field: String): Any = field match {
    case "created_utc" => dbl(d \ "created_utc")
    case "score" | "num_comments" => lng(d \ field)
    case other => str(d \ other)
  }

  private val fields = schema.fieldNames

  override def next(): Boolean =
    if (!posts.hasNext) false
    else {
      val d = posts.next()
      current = InternalRow.fromSeq(
        fields.toIndexedSeq.map(f => value(d, f)))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
