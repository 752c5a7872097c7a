package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

import graft.model.{BootstrapConfig, GraftException}

/** The reference's runtime self-validation surface (SURVEY §5) — its actual
  * correctness contract.
  */
object Validate {

  /** M6: key/precombine/partition fields must exist in the input schema
    * (validate_fields_in_schema, pyspark_script.py:121-144). Error strings
    * follow the reference's shapes.
    */
  def fieldsInSchema(schema: StructType, cfg: BootstrapConfig): Unit =
    fieldsInSchema(schema, cfg.keyFields, cfg.precombineField, cfg.partitionFields)

  def fieldsInSchema(
      schema: StructType,
      keyFields: Seq[String],
      precombineField: String,
      partitionFields: Seq[String]): Unit = {
    val names = schema.fieldNames.toSet
    val errors = Seq.newBuilder[String]
    keyFields.filterNot(names.contains).foreach { k =>
      errors += s"Key field '$k' not found in schema."
    }
    if (!names.contains(precombineField))
      errors += s"Precombine field '$precombineField' not found in schema."
    partitionFields.filterNot(names.contains).foreach { p =>
      errors += s"Partition field '$p' not found in schema."
    }
    val errs = errors.result()
    if (errs.nonEmpty) throw GraftException.config(errs.mkString("\n"))
  }

  final case class Report(inputCount: Long, tableCount: Long, issues: Seq[String]) {
    def ok: Boolean = issues.isEmpty
    /** The exact cross-process log-line contract (pyspark_script.py:170-171,
      * regex-mined back at app.py:320-321).
      */
    def logLines: Seq[String] = Seq(
      s"Total records in Input DataFrame: $inputCount",
      s"Total records in Hudi table: $tableCount")
  }

  /** J3 + A1/A2 post-write reconciliation (validate_post_bootstrap,
    * pyspark_script.py:146-178): every input column exists in the table
    * (meta-columns excluded by `_` prefix), exact dtype equality, exact
    * row-count equality. The two counts are the only full-table jobs; both
    * are column-pruned count(*) scans.
    */
  def postBootstrap(input: DataFrame, table: DataFrame): Report = {
    val issues = Seq.newBuilder[String]
    val inputCols = input.schema.fields.map(f => f.name -> f.dataType).toMap
    val tableCols = table.schema.fields.filterNot(_.name.startsWith("_"))
      .map(f => f.name -> f.dataType).toMap
    val missing = input.schema.fieldNames.filterNot(tableCols.contains)
    if (missing.nonEmpty)
      issues += s"Columns ${missing.mkString(", ")} are missing in Hudi table."
    inputCols.foreach { case (name, dt) =>
      tableCols.get(name).foreach { tdt =>
        if (dt != tdt)
          issues += s"Data type mismatch for column '$name': Input type '$dt' vs Hudi type '$tdt'."
      }
    }
    val inputCount = input.count()
    val tableCount = table.count()
    if (inputCount != tableCount)
      issues += s"Record count mismatch: Input has $inputCount records, Hudi table has $tableCount records."
    Report(inputCount, tableCount, issues.result())
  }
}
