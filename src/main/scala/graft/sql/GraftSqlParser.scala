package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.Hnsw

/**
 * SQL surface for the index DDL — what a user of the reference types today
 * (/root/reference/README.md:21-46 and the test/sql/hnsw suite):
 *
 *   CREATE [OR REPLACE] INDEX idx ON tbl USING HNSW (col)
 *       WITH (id_column = 'id', metric = 'l2sq', ef_construction = 128, …)
 *   DROP INDEX [IF EXISTS] idx
 *   PRAGMA hnsw_compact_index('idx')
 *   PRAGMA hnsw_index_info
 *
 * Implemented as a delegating parser (injected via `injectParser`): the
 * four statement shapes above are recognized up front, everything else goes
 * to Spark's parser untouched. One deliberate difference from DuckDB: Spark
 * tables have no implicit rowid, so `WITH (id_column = '…')` naming a
 * BIGINT column is required (SURVEY §1.4).
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = DistanceOperators.rewrite(sqlText).trim.stripSuffix(";").trim
    t match {
      case CreateIndexRe(orReplace, name, table, column, withOpts) =>
        val opts = parseOptions(Option(withOpts))
        val idCol = opts.getOrElse("id_column",
          throw new IllegalArgumentException(
            "HNSW index requires WITH (id_column = '<BIGINT column>'): Spark tables have no implicit rowid"))
        CreateHnswIndexCommand(name, table, column, idCol,
          opts - "id_column", orReplace != null)
      case DropIndexRe(ifExists, name) =>
        DropHnswIndexCommand(name, ifExists != null)
      case CompactRe(name) =>
        CompactHnswIndexCommand(name)
      case InfoRe() =>
        HnswIndexInfoCommand()
      case _ => delegate.parsePlan(DistanceOperators.rewrite(sqlText))
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(DistanceOperators.rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(DistanceOperators.rewrite(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private val CreateIndexRe =
    """(?is)CREATE\s+(OR\s+REPLACE\s+)?INDEX\s+([\w]+)\s+ON\s+([\w.]+)\s+USING\s+HNSW\s*\(\s*([\w]+)\s*\)(?:\s+WITH\s*\((.*)\))?""".r
  private val DropIndexRe = """(?is)DROP\s+INDEX\s+(IF\s+EXISTS\s+)?([\w]+)""".r
  private val CompactRe = """(?is)PRAGMA\s+hnsw_compact_index\s*\(\s*'([^']+)'\s*\)""".r
  private val InfoRe = """(?is)PRAGMA\s+hnsw_index_info\s*(?:\(\s*\))?""".r

  /** `k = v` pairs; values may be quoted. */
  private[sql] def parseOptions(s: Option[String]): Map[String, String] =
    s.map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2).map(_.trim)
      k -> v.stripPrefix("'").stripSuffix("'")
    }.toMap).getOrElse(Map.empty)
}

case class CreateHnswIndexCommand(name: String, table: String, column: String,
    idColumn: String, options: Map[String, String], orReplace: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Hnsw.createIndex(spark, name, spark.table(table), column, idColumn,
      options, overwrite = orReplace)
    Seq.empty
  }
}

case class DropHnswIndexCommand(name: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = Hnsw.dropIndex(spark, name)
    if (!dropped && !ifExists) {
      throw new IllegalArgumentException(s"Index '$name' does not exist")
    }
    Seq.empty
  }
}

case class CompactHnswIndexCommand(name: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Hnsw.compactIndex(spark, name)
    Seq.empty
  }
}

case class HnswIndexInfoCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(Hnsw.InfoSchema)
  override def run(spark: SparkSession): Seq[Row] =
    Hnsw.indexInfo(spark).collect().toIndexedSeq
}
