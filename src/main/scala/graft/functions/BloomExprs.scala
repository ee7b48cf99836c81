package graft.functions

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe.
  *
  * The incremental-dedup scale path builds a Bloom filter over the
  * historical corpus' content keys on the driver (a mergeable sketch —
  * on a real cluster each task builds a partial and the driver ORs
  * them, which is exactly what `DataFrameStatFunctions.bloomFilter`
  * does), then probes it per new-batch row. A probe that returns false
  * is DEFINITELY new — those rows skip the dedup shuffle entirely;
  * only the (tiny) might-contain set goes through the exact anti-join.
  *
  * This is the same runtime-filter shape Spark itself injects for
  * shuffle pruning, expressed as a first-class operator. The filter
  * object rides into generated code via `ctx.addReferenceObj` — the
  * probe is one virtual call on a long, fused into the surrounding
  * WholeStageCodegen stage (no UDF, no serialization per batch).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExprs {
  private val n = new AtomicInteger(0)

  /** Column form of the probe: true iff `keySql` (a BIGINT-typed SQL
    * expression, e.g. `xxhash64(text)`) might be in `bloom`. The
    * filter object can't ride through SQL text, so each call registers
    * a uniquely-named temp function whose builder closes over it —
    * same registry mechanism as [[VectorExprs.register]].
    */
  def mightContain(spark: SparkSession, keySql: String, bloom: BloomFilter): Column = {
    val name = s"graft_bloom_${n.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (children: Seq[Expression]) => BloomMightContain(children.head, bloom), "scala_udf")
    expr(s"$name($keySql)")
  }
}
