package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** hash_featurize(metrics): deterministic feature-hashing embedding of a
  * metric map into a fixed-dim unit float vector.
  *
  * Replaces the reference's Ollama text-embedding call
  * (`/root/reference/pipeline/kafka_consumer.py:345-379`) with a local,
  * reproducible featurizer — legitimate because the reference itself treats
  * embeddings as externally produced
  * (`docs/SCYLLADB_VECTOR_SEARCH_REFERENCE.md:46-47`); any real embedder
  * stays pluggable. The contract preserved: similar metric maps map to
  * nearby vectors (cosine-comparable), and an empty map maps to the zero
  * vector, which the cosine convention scores 0.0 everywhere (the
  * reference's failed-embed semantic, kafka_consumer.py:377-379).
  *
  * Scheme: each (name, value) entry adds `value` at dim h(name + "#v") and
  * `log1p(|value|) * sign(value)` at dim h(name + "#l"); the result is
  * L2-normalized. Hashing is FNV-1a (self-contained, deterministic).
  */
case class HashFeaturize(child: Expression, dim: Int, seed: Int = 42)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_featurize requires map<string,double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_featurize"

  @inline private def fnv1a(s: String, salt: Int): Int = {
    var h = 0x811c9dc5 ^ (seed * 0x9e3779b1) ^ (salt * 0x85ebca6b)
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x01000193; i += 1 }
    h
  }

  override def nullSafeEval(m: Any): Any = {
    val map = m.asInstanceOf[MapData]
    val keys = map.keyArray()
    val vals = map.valueArray()
    val acc = new Array[Double](dim)
    var i = 0
    while (i < map.numElements()) {
      val name = keys.getUTF8String(i).toString
      val v = vals.getDouble(i)
      val i1 = math.floorMod(fnv1a(name, 1), dim)
      val i2 = math.floorMod(fnv1a(name, 2), dim)
      acc(i1) += v
      acc(i2) += math.log1p(math.abs(v)) * math.signum(v)
      i += 1
    }
    var norm2 = 0.0
    i = 0
    while (i < dim) { norm2 += acc(i) * acc(i); i += 1 }
    val norm = math.sqrt(norm2)
    val out = new Array[Float](dim)
    if (norm > 0.0) {
      i = 0
      while (i < dim) { out(i) = (acc(i) / norm).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFeaturize {
  /** Reference embedding dimension (create_iot_schema.py:31). */
  val DefaultDim = 384
}
