package graft

import scala.collection.concurrent.TrieMap

/**
 * Run-time registry of driver-computed literal tables that the
 * correctness gates share between their Spark plan and their generated
 * oracle SQL.
 *
 * Why this exists: a hash-compared gate surface must contain NO
 * engine-evaluated transcendental — `ln()` can differ by one ulp
 * between libm builds, and a near-boundary value then flips the
 * 6dp-rounded digit (observed in round 6: all five ln-dependent gates
 * hash-failed in the driver's DuckDB while passing bit-exact under a
 * local build). The fix is to evaluate the transcendental ONCE, on the
 * JVM, quantize to a fixed scale, and feed the identical literal table
 * to both engines: the gate query registers its table here while it
 * builds the Spark plan, and [[SparkEntry.oracleSql]] (a `def`,
 * re-evaluated by [[Verify]] AFTER all queries ran) interpolates the
 * same table into the oracle SQL as a `VALUES` CTE. Both engines then
 * perform only exact decimal/integer arithmetic plus correctly-rounded
 * IEEE double ops on identical operands.
 *
 * If a gate's table was never registered (oracleSql inspected without
 * running the query), the oracle builders fall back to the ln-based
 * SQL — still locally correct, just not portability-hardened.
 */
object GateTables {
  private val frags = new TrieMap[String, String]()

  def put(key: String, sqlFragment: String): Unit = frags.put(key, sqlFragment)
  def get(key: String): Option[String] = frags.get(key)

  /** The plain decimal string of a scale-fixed BigDecimal — parses to
    * the identical value in any SQL engine (`CAST('…' AS DECIMAL)` /
    * `CAST('…' AS DOUBLE)` are correctly rounded everywhere, as is the
    * JVM's `doubleValue()`).
    */
  def lit(v: java.math.BigDecimal): String = v.toPlainString

  /** SQL string literal with single quotes doubled. */
  def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"
}
