package graft.ml

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small bridges between relational Array[Float|Double] columns and
  * ml.linalg Vector columns (the two vector worlds of SURVEY.md §1.3). */
object VectorOps {

  /** Array column → ml Vector column (for ml.feature/clustering stages). */
  def toMlVector(arr: Column): Column =
    array_to_vector(arr)

  /** ml Vector column → double-array column (for relational math). */
  def toArray(vec: Column): Column = vector_to_array(vec)

  /** Dimensionality of an ml Vector column, as a long. */
  def dim(vec: Column): Column = size(vector_to_array(vec)).cast("long")
}
