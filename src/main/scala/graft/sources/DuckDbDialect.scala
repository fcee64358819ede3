package graft.sources

import java.sql.{SQLException, Types}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/** Spark `JdbcDialect` for DuckDB (`jdbc:duckdb:`), registered through the
  * public `JdbcDialects.registerDialect` extension point — the same
  * mechanism Spark's own MySQL/Postgres dialects use, and the hook the
  * reference's MySQL connectivity (src/data_processor.py:198-206) rides on
  * implicitly.
  *
  * Why it exists at all: DuckDB's JDBC driver reports a NULL `SQLState` on
  * every `SQLException`. Spark 4's `JdbcUtils.tableExists` probes
  * `SELECT 1 FROM t WHERE 1=0` and classifies the failure via
  * `dialect.isObjectNotFoundException`, whose DEFAULT checks
  * `SQLState.startsWith("42")` — with a null state the probe failure is
  * treated as a real error and RETHROWN, so every first write to a DuckDB
  * URL dies inside the existence check. Classifying DuckDB's catalog
  * errors by message restores the whole `spark.read/write.format("jdbc")`
  * surface; everything else (quoting with double quotes, ANSI type DDL)
  * already matches DuckDB's ANSI behavior in the default dialect.
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  // DuckDB catalog errors carry no SQLState; match the stable message
  // prefix ("Catalog Error: Table with name ... does not exist").
  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Catalog Error") && m.contains("does not exist")
  }

  // Same null-SQLState problem for the syntax-error classifier (used by
  // Spark to decide whether an option like a custom query is malformed).
  override def isSyntaxErrorBestEffort(e: SQLException): Boolean =
    Option(e.getMessage).getOrElse("").contains("Parser Error")

  // DuckDB's JDBC ResultSetMetaData reports isSigned=false for SIGNED
  // integer columns, which makes Spark's default mapping promote BIGINT to
  // DecimalType(20,0) (its unsigned-overflow escape hatch). Pin the SIGNED
  // type names to their natural Catalyst types; DuckDB's genuinely
  // unsigned types report distinct names (UBIGINT, UINTEGER, ...) and
  // still take the default promotion path.
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    (sqlType, typeName.toUpperCase(java.util.Locale.ROOT)) match {
      case (Types.BIGINT, "BIGINT")     => Some(LongType)
      case (Types.INTEGER, "INTEGER")   => Some(IntegerType)
      case (Types.SMALLINT, "SMALLINT") => Some(ShortType)
      case (Types.TINYINT, "TINYINT")   => Some(ByteType)
      case _                            => None
    }

  private val registered = new AtomicBoolean(false)

  /** Idempotent registration; call before the first DuckDB read/write.
    * `JdbcDialects.registerDialect` PREPENDS, so re-registering on every
    * call would shadow-stack duplicates — hence the guard.
    */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) {
      JdbcDialects.registerDialect(this)
    }
}
