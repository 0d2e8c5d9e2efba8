package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.table.ManagedTable

/** SQL table-valued functions over [[ManagedTable]], registered through
  * `SparkSessionExtensions.injectTableFunction` — the architecture Delta
  * uses for its `table_changes(...)` TVF, and the composable-in-a-SELECT
  * complement to the [[GraftSqlCommands]] statements:
  *
  * {{{
  * SELECT * FROM graft_version('/w/t', 3)              -- VERSION AS OF
  * SELECT * FROM graft_as_of('/w/t', '2026-08-01T00:00:00Z') -- TIMESTAMP AS OF
  * SELECT * FROM graft_history('/w/t')
  * SELECT * FROM graft_table_changes('/w/t', 0, 2, 'k')  -- CDF on key k
  * }}}
  *
  * Because these return plain logical plans, they join/filter/aggregate
  * like any table — `SELECT change_type, count(*) FROM
  * graft_table_changes(...) GROUP BY 1` — and every downstream Catalyst
  * optimization (pushdown into the snapshot's parquet scan, pruning)
  * applies. Arguments must be literals: the plan is resolved at analysis
  * time, exactly like Delta's time-travel resolution.
  */
object GraftTableFunctions {

  private def lit(e: Expression, fn: String, what: String): Any = e match {
    case l: Literal => l.value
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be a literal, got ${e.sql}")
  }
  private def str(e: Expression, fn: String, what: String): String =
    String.valueOf(lit(e, fn, what))
  private def long(e: Expression, fn: String, what: String): Long =
    lit(e, fn, what) match {
      case n: Number => n.longValue()
      case v => throw new IllegalArgumentException(s"$fn: $what must be integral, got $v")
    }

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical

  // usage strings live in the Scaladoc above; the 3-arg ExpressionInfo
  // ctor skips the strict group/since/source validation of the full form
  private def tvf(name: String)(
      builder: Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier(name),
    new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName, null, name),
    builder)

  /** All graft TVFs, for `SparkSessionExtensions.injectTableFunction`. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    tvf("graft_version") { args =>
      require(args.length == 2, "graft_version(path, version)")
      val s = SparkSession.active
      plan(new ManagedTable(s, str(args(0), "graft_version", "path"))
        .readVersion(long(args(1), "graft_version", "version")))
    },
    tvf("graft_as_of") { args =>
      require(args.length == 2, "graft_as_of(path, timestamp)")
      val s = SparkSession.active
      plan(new ManagedTable(s, str(args(0), "graft_as_of", "path"))
        .readAsOf(str(args(1), "graft_as_of", "timestamp")))
    },
    tvf("graft_history") { args =>
      require(args.length == 1, "graft_history(path)")
      val s = SparkSession.active
      plan(new ManagedTable(s, str(args(0), "graft_history", "path")).history())
    },
    tvf("graft_table_changes") { args =>
      require(args.length >= 4, "graft_table_changes(path, fromV, toV, key1[, key2, ...])")
      val s = SparkSession.active
      val keys = args.drop(3).map(str(_, "graft_table_changes", "key"))
      plan(new ManagedTable(s, str(args(0), "graft_table_changes", "path"))
        .changes(long(args(1), "graft_table_changes", "fromV"),
          long(args(2), "graft_table_changes", "toV"), keys))
    },
    // keyless CDF over row tracking — `changesById` as a TVF: no key
    // arguments at all, insert/delete classified by stable row id
    tvf("graft_changes_by_id") { args =>
      require(args.length == 3, "graft_changes_by_id(path, fromV, toV)")
      val s = SparkSession.active
      plan(new ManagedTable(s, str(args(0), "graft_changes_by_id", "path"))
        .changesById(long(args(1), "graft_changes_by_id", "fromV"),
          long(args(2), "graft_changes_by_id", "toV")))
    },
    // the contamination screen as a TVF — (doc_id, contamination) rows
    // that compose into ordinary SELECTs (quarantine joins, threshold
    // filters, GROUP BY lang rollups) the way `graft_table_changes`
    // does for CDF. Both sides are managed-table paths; the corpus side
    // rides the per-file shingle-bloom file skipping automatically when
    // `addShingleBloomIndex` declared one (identical answers either way).
    tvf("graft_contamination") { args =>
      require(args.length == 5 || args.length == 4,
        "graft_contamination(corpusPath, benchPath, idCol, textCol[, n])")
      val s = SparkSession.active
      val fn = "graft_contamination"
      val corpus = new ManagedTable(s, str(args(0), fn, "corpusPath"))
      val bench = new ManagedTable(s, str(args(1), fn, "benchPath")).read
      val n = if (args.length == 5) long(args(4), fn, "n").toInt else 3
      plan(graft.ops.Dedup.contaminationIndexed(corpus, bench,
        str(args(2), fn, "idCol"), str(args(3), fn, "textCol"), n))
    },
    // the FIXED-model quality scorer as a TVF — (doc_id, n_tokens,
    // logit, keep) rows; the learned-classifier scoring plan with the
    // cross-engine-exact integer model (q145's anchor), composable into
    // corpus-hygiene SELECTs
    tvf("graft_quality_score") { args =>
      require(args.length == 4,
        "graft_quality_score(path, idCol, textCol, buckets)")
      val s = SparkSession.active
      val fn = "graft_quality_score"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      plan(graft.ops.QualityClassifier.scoreFixed(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "textCol"),
        long(args(3), fn, "buckets").toInt))
    },
    // the TRAINED scorer as a TVF — train with the API, persist with
    // [[graft.ops.QualityClassifier.saveModel]], then score any corpus in
    // plain SQL: the model argument is a managed-table PATH, so model
    // versioning (time travel, CLONE) composes too. Emits (doc_id,
    // logit, p, keep) — scoreModel's shape.
    tvf("graft_quality_score_model") { args =>
      require(args.length == 4,
        "graft_quality_score_model(path, idCol, textCol, modelPath)")
      val s = SparkSession.active
      val fn = "graft_quality_score_model"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      val (model, _) = graft.ops.QualityClassifier.loadModel(
        new ManagedTable(s, str(args(3), fn, "modelPath")))
      plan(graft.ops.QualityClassifier.scoreModel(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "textCol"), model))
    },
    // the trained TOKENIZER as a TVF — train with the API, persist the
    // ranked merge list with [[graft.ops.Bpe.saveMerges]], then encode
    // any corpus in plain SQL: (doc_id, tokens) rows, the merges argument
    // a managed-table PATH (time travel/CLONE = tokenizer versioning).
    tvf("graft_bpe_encode") { args =>
      require(args.length == 4,
        "graft_bpe_encode(path, idCol, textCol, mergesPath)")
      val s = SparkSession.active
      val fn = "graft_bpe_encode"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      val merges = graft.ops.Bpe.loadMerges(
        new ManagedTable(s, str(args(3), fn, "mergesPath")))
      plan(graft.ops.Bpe.encode(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "textCol"), merges))
    },
    // sequence packing as a TVF — the loader-side tail of the pipeline
    // (annotate → dedup → split → PACK) composable in a SELECT:
    // (seq_id, doc_id, seq_offset, doc_offset, slice_len) rows from
    // concat-and-chunk over `tokenCol` (a per-doc token count column) in
    // idCol order. Same distributed two-pass prefix sum as the API.
    tvf("graft_pack_sequences") { args =>
      require(args.length == 4,
        "graft_pack_sequences(path, idCol, tokenCol, seqLen)")
      val s = SparkSession.active
      val fn = "graft_pack_sequences"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      plan(graft.ops.Sampling.concatChunkSlices(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "tokenCol"),
        long(args(3), fn, "seqLen")))
    },
    // the Stupid-Backoff LM scorer as a TVF — train with the API,
    // persist the count table with [[graft.ops.NgramLm.saveLm]], then
    // score any corpus in plain SQL: (doc_id, n_tokens, sb_q, hits3,
    // hits2, hits1, oov) rows, the integer statistic q153 anchors; the
    // model argument is a managed-table PATH (time travel/CLONE = LM
    // versioning, the quality-score-model shape).
    tvf("graft_lm_score") { args =>
      require(args.length == 4,
        "graft_lm_score(path, idCol, textCol, modelPath)")
      val s = SparkSession.active
      val fn = "graft_lm_score"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      val model = graft.ops.NgramLm.loadLm(
        new ManagedTable(s, str(args(3), fn, "modelPath")))
      plan(graft.ops.NgramLm.scoreQuantized(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "textCol"), model))
    },
    // exact-substring dedup in SQL: maximal duplicated token spans
    // (doc_id, span_start, span_len) and the excision twin (doc_id,
    // clean_text, tokens_kept, tokens_dropped) — the q154/q155 operators
    // over a managed-table path, composable into hygiene SELECTs
    tvf("graft_duplicated_spans") { args =>
      require(args.length == 4,
        "graft_duplicated_spans(path, idCol, textCol, k)")
      val s = SparkSession.active
      val fn = "graft_duplicated_spans"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      plan(graft.ops.Dedup.duplicatedSpans(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "textCol"),
        long(args(3), fn, "k").toInt))
    },
    // whole-doc no-split packing as a TVF — the SFT-side sibling of
    // graft_pack_sequences: (doc_id, n_tokens, fit, bin) rows, (fit,
    // bin) the sequence key
    tvf("graft_pack_whole_docs") { args =>
      require(args.length == 4,
        "graft_pack_whole_docs(path, idCol, tokenCol, seqLen)")
      val s = SparkSession.active
      val fn = "graft_pack_whole_docs"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      plan(graft.ops.Sampling.packWholeDocs(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "tokenCol"),
        long(args(3), fn, "seqLen")))
    },
    tvf("graft_excise_spans") { args =>
      require(args.length == 4,
        "graft_excise_spans(path, idCol, textCol, k)")
      val s = SparkSession.active
      val fn = "graft_excise_spans"
      val t = new ManagedTable(s, str(args(0), fn, "path"))
      plan(graft.ops.Dedup.exciseDuplicatedSpans(t.read,
        str(args(1), fn, "idCol"), str(args(2), fn, "textCol"),
        long(args(3), fn, "k").toInt))
    })
}
