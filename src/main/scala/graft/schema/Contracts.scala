package graft.schema

import org.apache.spark.sql.types._
import graft.bronze.Validation.{Rule, fixedLength, maxLength, nonNegative, notEmpty, notNull, orderedPair}

/** The reference's five raw-table contracts, as explicit StructTypes +
  * snake_case rename maps + validation rule sets.
  *
  * Source: Meta_Guideline.md:885-898 (users), 1063-1088 (datasets),
  * 1248-1251 (tags); requirements/meta/meta_module_06_requirements.md:49-57.
  * `inferSchema` is prohibited (reference README.md:777) — every source read
  * carries one of these contracts. All IDs stay StringType pipeline-wide
  * (requirements/...:21, 161).
  */
object Contracts {

  final case class TableContract(
      name: String,
      raw: StructType,
      rename: Seq[(String, String)],
      timestampCols: Seq[String],
      booleanCols: Seq[String],
      rules: Seq[Rule],
      numericCols: Seq[(String, String)] = Nil // (column, spark type) via try_cast
  )

  val TsFormat = "yyyy-MM-dd HH:mm:ss"

  private def s(n: String) = StructField(n, StringType, nullable = true)

  val users: TableContract = TableContract(
    name = "users",
    raw = StructType(Seq(s("Id"), s("UserName"), s("RegisterDate"), s("Country"))),
    rename = Seq("Id" -> "user_id", "UserName" -> "user_name",
      "RegisterDate" -> "signup_ts", "Country" -> "country_code"),
    timestampCols = Seq("signup_ts"),
    booleanCols = Nil,
    rules = Seq(
      notNull("user_id"),
      notEmpty("user_id"),
      notNull("user_name"),
      fixedLength("country_code", 2)
    )
  )

  val datasets: TableContract = TableContract(
    name = "datasets",
    raw = StructType(Seq(s("Id"), s("Title"), s("Subtitle"), s("CreatorUserId"),
      s("TotalViews"), s("TotalDownloads"), s("CreationDate"), s("LastUpdatedDate"),
      s("Type"), s("IsPrivate"))),
    rename = Seq("Id" -> "dataset_id", "Title" -> "dataset_title",
      "Subtitle" -> "dataset_subtitle", "CreatorUserId" -> "owner_user_id",
      "TotalViews" -> "total_views", "TotalDownloads" -> "total_downloads",
      "CreationDate" -> "created_ts", "LastUpdatedDate" -> "updated_ts",
      "Type" -> "dataset_type", "IsPrivate" -> "is_private"),
    timestampCols = Seq("created_ts", "updated_ts"),
    booleanCols = Seq("is_private"),
    rules = Seq(
      notNull("dataset_id"),
      notEmpty("dataset_id"),
      notNull("dataset_title"),
      notNull("owner_user_id"),
      nonNegative("total_views"),
      nonNegative("total_downloads"),
      orderedPair("created_ts", "updated_ts")
    ),
    numericCols = Seq("total_views" -> "bigint", "total_downloads" -> "bigint")
  )

  val competitions: TableContract = TableContract(
    name = "competitions",
    raw = StructType(Seq(s("Id"), s("Title"), s("Category"), s("StartDate"),
      s("Deadline"), s("PrizeMoney"))),
    rename = Seq("Id" -> "competition_id", "Title" -> "title",
      "Category" -> "category", "StartDate" -> "start_ts",
      "Deadline" -> "deadline_ts", "PrizeMoney" -> "prize_money"),
    timestampCols = Seq("start_ts", "deadline_ts"),
    booleanCols = Nil,
    rules = Seq(
      notNull("competition_id"),
      notNull("title"),
      nonNegative("prize_money"),
      orderedPair("start_ts", "deadline_ts")
    ),
    numericCols = Seq("prize_money" -> "double")
  )

  val tags: TableContract = TableContract(
    name = "tags",
    raw = StructType(Seq(s("DatasetId"), s("Tags"))),
    rename = Seq("DatasetId" -> "dataset_id"),
    timestampCols = Nil,
    booleanCols = Nil,
    rules = Seq(
      notNull("dataset_id"),
      // post-explode rules (applied after tag normalization):
      notNull("tag"),
      notEmpty("tag"),
      maxLength("tag", 100)
    )
  )

  val kernels: TableContract = TableContract(
    name = "kernels",
    raw = StructType(Seq(s("Id"), s("AuthorUserId"), s("Title"),
      s("CreationDate"), s("LastUpdatedDate"))),
    rename = Seq("Id" -> "kernel_id", "AuthorUserId" -> "author_user_id",
      "Title" -> "title", "CreationDate" -> "created_ts",
      "LastUpdatedDate" -> "updated_ts"),
    timestampCols = Seq("created_ts", "updated_ts"),
    booleanCols = Nil,
    rules = Seq(
      notNull("kernel_id"),
      notNull("author_user_id"),
      notNull("title"),
      orderedPair("created_ts", "updated_ts")
    )
  )

  val all: Seq[TableContract] = Seq(users, datasets, competitions, tags, kernels)
}
