package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/**
 * Schema-drift guard for the driver-generated testdata tables.
 *
 * Round 7 lost 22 gates SILENTLY when `events.parquet` regenerated with
 * `ts` as timestamp[us] (was TIMESTAMP(NANOS)): the reader threw at
 * plan time, Verify swallowed the per-query failure, and the queries
 * simply vanished from the correctness report. This check runs BEFORE
 * the query loop and fails loudly, naming the table and the exact
 * drift, so a regenerated table can never again read as "queries
 * disappeared".
 *
 * Each column admits a SET of Spark-read dtypes — the driver has
 * legitimately regenerated files with different physical types across
 * rounds, and the readers (e.g. [[SparkEntry.events]]) adapt to every
 * accepted shape. Drift beyond the accepted set means the readers'
 * assumptions no longer hold and every downstream result is suspect:
 * stopping with a named error beats producing 100 wrong gates.
 * Additional columns are tolerated (additive drift breaks nothing);
 * missing tables, missing columns, and unaccepted dtypes throw.
 */
object TableSchemas {

  /** Column admission: named predicate over the Spark-read dtype. */
  final case class Accepts(desc: String, ok: DataType => Boolean)

  private val i32or64 = Accepts("int32|int64",
    t => t == IntegerType || t == LongType)
  private val i64 = Accepts("int64", _ == LongType)
  private val f64 = Accepts("double", _ == DoubleType)
  private val str = Accepts("string", _ == StringType)
  private val tsAny = Accepts("int64(nanos-as-long)|timestamp|timestamp_ntz",
    t => t == LongType || t == TimestampType || t == TimestampNTZType)
  private val floatArr = Accepts("array<float>", {
    case ArrayType(FloatType, _) => true
    case _ => false
  })

  /** Expected testdata surface: the columns the gates actually read. */
  val expected: Map[String, Seq[(String, Accepts)]] = Map(
    "region" -> Seq("r_regionkey" -> i32or64, "r_name" -> str),
    "nation" -> Seq("n_nationkey" -> i32or64, "n_name" -> str,
      "n_regionkey" -> i32or64),
    "customer" -> Seq("c_custkey" -> i64, "c_name" -> str,
      "c_nationkey" -> i32or64, "c_acctbal" -> f64, "c_mktsegment" -> str),
    "supplier" -> Seq("s_suppkey" -> i64, "s_name" -> str,
      "s_nationkey" -> i32or64, "s_acctbal" -> f64),
    "part" -> Seq("p_partkey" -> i64, "p_name" -> str, "p_brand" -> str,
      "p_type" -> str, "p_size" -> i32or64, "p_retailprice" -> f64),
    "orders" -> Seq("o_orderkey" -> i64, "o_custkey" -> i64,
      "o_orderstatus" -> str, "o_totalprice" -> f64,
      "o_orderdate" -> tsAny, "o_orderpriority" -> str),
    "lineitem" -> Seq("l_orderkey" -> i64, "l_partkey" -> i64,
      "l_suppkey" -> i64, "l_linenumber" -> i32or64, "l_quantity" -> f64,
      "l_extendedprice" -> f64, "l_discount" -> f64, "l_tax" -> f64,
      "l_returnflag" -> str, "l_linestatus" -> str, "l_shipdate" -> tsAny),
    "events" -> Seq("event_id" -> i64, "ts" -> tsAny, "user_id" -> i64,
      "event_type" -> str, "value" -> f64, "props" -> str),
    "documents" -> Seq("doc_id" -> i64, "text" -> str, "lang" -> str,
      "source" -> str, "n_chars" -> i64),
    "embeddings" -> Seq("vec_id" -> i64, "embedding" -> floatArr)
  )

  /** Validate every expected table under `dir`; throws
    * IllegalStateException listing EVERY drift (table, column, found vs
    * accepted) — all problems in one message, not just the first.
    */
  def check(
      spark: SparkSession,
      dir: String,
      tables: Map[String, Seq[(String, Accepts)]] = expected
  ): Unit = {
    // the i64(nanos-as-long) accepted shape is only reachable when the
    // legacy conf is on — without it a TIMESTAMP(NANOS) regeneration
    // would crash schema inference ("Illegal Parquet type") before the
    // accepted-set comparison ever runs; SparkEntry.events sets it too,
    // but check() runs FIRST in Verify
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = tables.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      if (!new java.io.File(path).exists())
        Seq(s"$table: MISSING ($path does not exist)")
      else {
        val schema = spark.read.parquet(path).schema
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        cols.flatMap { case (name, acc) =>
          byName.get(name) match {
            case None =>
              Some(s"$table.$name: MISSING (have: ${schema.fieldNames.mkString(", ")})")
            case Some(t) if !acc.ok(t) =>
              Some(s"$table.$name: dtype $t not in accepted {${acc.desc}}")
            case _ => None
          }
        }
      }
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"TESTDATA SCHEMA DRIFT under $dir (${problems.size} problem(s)) — " +
          "the driver regenerated a table outside the readers' accepted " +
          "shapes; adapt the reader(s) before trusting any gate result:\n  " +
          problems.mkString("\n  "))
  }
}
