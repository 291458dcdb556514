package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row shapes for the engine's core tables (SURVEY.md §1.2: the
  * issues table is the fixed-schema case — `Dataset[T]` with case-class
  * Encoders where type safety helps; DataFrame where schema is dynamic,
  * e.g. the union-merged raw JSON events). */
object Schemas {

  /** The document corpus row (the issues-table analog). */
  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

  /** An embedding row. */
  final case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def documents(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.table(spark, sfDir, "documents").as[Doc]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.table(spark, sfDir, "embeddings").as[Embedding]
  }
}
