package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_gram_hits(tokens, sortedHashes, n)` — how many DISTINCT n-gram
  * token windows of `tokens` hash into the sorted xxhash64 membership
  * array (seed 42, space-joined gram text — byte-identical to the
  * relational `xxhash64(gram)` the join-form decontamination keys on).
  * The scan-side kernel of [[graft.dedup.Curation.decontaminateScan]],
  * previously a ScalaUDF closure: the native form reads the token
  * ArrayData directly (no per-row Catalyst array→Seq conversion) and
  * stays inside whole-stage codegen. The membership array is a FOLDABLE
  * literal decoded once per task ([[NnTopK]] pattern) — its size is the
  * eval benchmark's distinct grams, fixed w.r.t. the train corpus.
  * Per-row cost O(tokens · (gram-build + log hashes)). Returns 0 for
  * null/short inputs (the join form's left-anti coalesce contract). */
case class GramHits(tokens: Expression, hashes: Expression, n: Int)
  extends Expression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def children: Seq[Expression] = Seq(tokens, hashes)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_hits"

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => hashes.dataType match {
      case ArrayType(LongType, _) if hashes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<bigint> membership set")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got $other")
  }

  // decoded once per (deserialized) expression instance; MUST be sorted
  // ascending (the caller sorts) — binary-searched per gram
  @transient private lazy val sortedHashes: Array[Long] =
    hashes.eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray()

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) 0L
    else GramHits.count(t.asInstanceOf[ArrayData], sortedHashes, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("gramHashes", sortedHashes, "long[]")
    val t = tokens.genCode(ctx)
    ev.copy(code = code"""
      ${t.code}
      long ${ev.value} = ${t.isNull} ? 0L :
        graft.expr.GramHits.count(${t.value}, $setRef, $n);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramHits =
    copy(tokens = newChildren(0), hashes = newChildren(1))
}

object GramHits {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  /** Distinct sliding n-gram windows present in the sorted hash set.
    * Grams are string-deduped BEFORE hashing (a hash collision can only
    * create a false membership hit, never merge two distinct grams of
    * one doc) — the same order of operations as the join form's
    * array_distinct-then-xxhash64. Windows containing a null element are
    * skipped (defined contract: a null token is not part of any gram —
    * the registered SQL function accepts arbitrary arrays, and the
    * in-tree tokenizers never emit nulls). */
  def count(tokens: ArrayData, set: Array[Long], n: Int): Long = {
    val len = tokens.numElements()
    if (len < n || set.length == 0) return 0L
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder
    var cnt = 0L
    var i = 0
    while (i + n <= len) {
      sb.setLength(0)
      var j = 0
      var hasNull = false
      while (j < n && !hasNull) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
        }
        j += 1
      }
      if (!hasNull) {
        val g = sb.toString
        if (seen.add(g) &&
          java.util.Arrays.binarySearch(set,
            XxHash64Function.hash(
              UTF8String.fromString(g), StringType, 42L)) >= 0) cnt += 1
      }
      i += 1
    }
    cnt
  }
}
