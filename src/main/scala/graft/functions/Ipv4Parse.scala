package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native dotted-quad → uint32 parse: one pass over the string's bytes
  * instead of the anchored-octet-regex + split + 4-casts Column tower it
  * replaces (the regex alone dominated the ipv4_range filter's runtime —
  * BENCH_r02's slowest query). Semantics match the reference's
  * tryParseIPv4 (values_encoder.go:624-678): exactly four 0-255 octets,
  * no leading zeros, nothing else in the string; anything invalid → null.
  */
case class Ipv4ToLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ipv4 needs a string input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var ip = 0L; var oct = 0; var digits = 0; var parts = 0
    var lz = false; var ok = b.length >= 7 && b.length <= 15
    var i = 0
    while (i < b.length && ok) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        if (digits == 0) lz = c == '0'
        else if (lz) ok = false
        oct = oct * 10 + (c - '0'); digits += 1
        if (digits > 3 || oct > 255) ok = false
      } else if (c == '.') {
        if (digits == 0 || parts >= 3) ok = false
        else { ip = (ip << 8) | oct; oct = 0; digits = 0; parts += 1 }
      } else ok = false
      i += 1
    }
    if (ok && parts == 3 && digits > 0) java.lang.Long.valueOf((ip << 8) | oct)
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("b"); val ip = ctx.freshName("ip")
      val oct = ctx.freshName("oct"); val digits = ctx.freshName("digits")
      val parts = ctx.freshName("parts"); val ok = ctx.freshName("ok")
      val lz = ctx.freshName("lz"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |byte[] $b = $s.getBytes();
         |long $ip = 0L; int $oct = 0; int $digits = 0; int $parts = 0;
         |boolean $lz = false;
         |boolean $ok = $b.length >= 7 && $b.length <= 15;
         |for (int $i = 0; $i < $b.length && $ok; $i++) {
         |  byte $c = $b[$i];
         |  if ($c >= '0' && $c <= '9') {
         |    if ($digits == 0) { $lz = $c == '0'; }
         |    else if ($lz) { $ok = false; }
         |    $oct = $oct * 10 + ($c - '0'); $digits++;
         |    if ($digits > 3 || $oct > 255) { $ok = false; }
         |  } else if ($c == '.') {
         |    if ($digits == 0 || $parts >= 3) { $ok = false; }
         |    else { $ip = ($ip << 8) | $oct; $oct = 0; $digits = 0; $parts++; }
         |  } else { $ok = false; }
         |}
         |if ($ok && $parts == 3 && $digits > 0) {
         |  ${ev.value} = ($ip << 8) | $oct;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Ipv4ToLong =
    copy(child = newChild)

  override def prettyName: String = "graft_ipv4"
}

object Ipv4Parse {
  private def ensureRegistered(): Unit = GraftFunctions.ensure()

  /** Column API (same call_function registration route as DotProduct). */
  def ipv4ToLong(c: Column): Column = {
    ensureRegistered()
    call_function("graft_ipv4", c)
  }
}
