package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data preparation operators (driver north-star: the ops a
  * large-scale LLM data pipeline runs between raw corpus and tokenizer,
  * beyond dedup/similarity which live in NearDup/LlmOps): deterministic
  * corpus splitting, text normalization, and eval-set contamination
  * checking. All per-row work is codegen'd built-ins (regexp, substring,
  * higher-order array fns) — no UDFs — so every query here is a narrow
  * scan + cheap shuffle at any scale.
  */
object TrainPrep {

  /** q60 — deterministic train/val/test split: bucket = the first two
    * hex chars of md5(doc_id), split at 'cd' (≈80%) and 'e6' (≈10%).
    * Hash-based splits are THE reproducibility primitive for training
    * pipelines: membership is a pure function of the key — stable across
    * reruns, engines, partitionings, and corpus growth (a new doc never
    * moves an old doc's split), where sample()/rand() would reshuffle
    * everything. Emits per-split counts + checksums; the md5 prefix is
    * portable (identical hex in Spark and DuckDB). */
  val q60 = QuerySpec(
    "q60_train_split_hash",
    (s, d) => {
      import s.implicits._
      val bucket = substring(md5($"doc_id".cast("string").cast("binary")), 1, 2)
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket < "cd", "train").when(bucket < "e6", "val").otherwise("test"))
        .groupBy($"split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("chars_sum"),
          sum($"doc_id").as("id_checksum"))
        .orderBy($"split")
    },
    Some("""SELECT split, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
           |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |FROM (SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
           |             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
           |             ELSE 'test' END AS split, n_chars, doc_id
           |      FROM documents)
           |GROUP BY split ORDER BY split""".stripMargin),
  )

  /** q61 — text normalization / stopword scrub: drop determiner tokens
    * ("the"/"a") and collapse the whitespace they leave, reporting
    * per-doc removal counts and before/after lengths. The normalize-
    * before-tokenize stage of a data pipeline (PII redaction is the same
    * operator with a different pattern). Pure per-row regexp projection:
    * no shuffle at all except the output sort — embarrassingly parallel
    * at any scale. Patterns stay in the ASCII subset where Java regex
    * (Spark) and RE2 (DuckDB) agree on \b; DuckDB needs the explicit 'g'
    * flag Spark's regexp_replace implies. */
  val q61 = QuerySpec(
    "q61_text_normalize_scrub",
    (s, d) => {
      import s.implicits._
      val pat = "\\b(the|a)\\b"
      val scrubbed = trim(regexp_replace(regexp_replace($"text", pat, ""), "\\s+", " "))
      Tables.documents(s, d)
        .select(
          $"doc_id",
          size(regexp_extract_all($"text", lit(pat), lit(0))).as("n_removed"),
          char_length($"text").as("len_before"),
          char_length(scrubbed).as("len_after"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS INT) AS n_removed,
           |  CAST(len(text) AS INT) AS len_before,
           |  CAST(len(trim(regexp_replace(regexp_replace(text, '\b(the|a)\b', '', 'g'), '\s+', ' ', 'g'))) AS INT) AS len_after
           |FROM documents ORDER BY doc_id""".stripMargin),
  )

  /** q62 — eval-set contamination check: which corpus docs share char
    * 16-grams with the held-out eval docs (doc_id 1–5)? The benchmark-
    * leakage gate every training pipeline needs before shipping a split.
    * Shape: the eval side's distinct gram set is tiny (eval suites are
    * thousands of docs where the corpus is billions) → broadcast it; the
    * corpus side explodes per-doc distinct grams and semi-joins — one
    * scan, no corpus-side shuffle before the final per-doc count. At
    * 100 TB you'd swap full gram sets for q32's winnowed fingerprints
    * (same join shape, ~1/4 the gram volume); full sets here keep the
    * oracle exact. */
  val q62 = QuerySpec(
    "q62_eval_contamination",
    (s, d) => {
      import s.implicits._
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .filter(char_length($"text") >= 16)
        .select($"doc_id", explode(expr(
          "array_distinct(transform(sequence(1, char_length(text) - 15), i -> substring(text, i, 16)))"
        )).as("g"))
      val docs = Tables.fanOut(Tables.documents(s, d), col("doc_id"))
      val ev = grams(docs.filter($"doc_id".between(1, 5))).select($"g").distinct()
      val corpus = grams(docs.filter(!$"doc_id".between(1, 5)))
      corpus.join(broadcast(ev), Seq("g"), "inner")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shared_grams"))
        .orderBy($"n_shared_grams".desc, $"doc_id")
        .limit(20)
    },
    Some("""WITH g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, len(text) - 15), i -> substr(text, i, 16)))) AS g
           |  FROM documents WHERE len(text) >= 16),
           |ev AS (SELECT DISTINCT g FROM g WHERE doc_id BETWEEN 1 AND 5),
           |corpus AS (SELECT doc_id, g FROM g WHERE doc_id NOT BETWEEN 1 AND 5)
           |SELECT corpus.doc_id, count(*) AS n_shared_grams
           |FROM corpus JOIN ev USING (g)
           |GROUP BY corpus.doc_id
           |ORDER BY n_shared_grams DESC, doc_id LIMIT 20""".stripMargin),
  )

  val all: Seq[QuerySpec] = Seq(q60, q61, q62)
}
