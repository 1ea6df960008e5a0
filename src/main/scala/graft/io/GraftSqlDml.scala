package graft.io

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL ROW-LEVEL DML ON GRAFT TABLES — the extension tier that routes
  * `DELETE FROM` / `UPDATE` / `MERGE INTO` (and partitioned-table
  * `INSERT`) statements to the manifest's own transactional operations
  * ([[ManifestTable.deleteWhere]] / [[ManifestTable.updateWhere]] /
  * [[ManifestTable.mergeInto]] / [[ManifestTable.merge]] /
  * [[ManifestTable.overwriteData]]), the Delta shape: Spark's analyzer
  * resolves the statement, an injected resolution rule recognizes a
  * graft target and swaps in a runnable command BEFORE the v2-only
  * planner check would refuse it.
  *
  * Registered through `graft.GraftExtensions`
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * [[graft.GraftSession.create]]). WITHOUT the extension the engine is
  * still safe, just narrower: flat-table `INSERT` routes through the
  * built-in `InsertableRelation` analysis, and every other SQL write
  * fails loudly (Spark's v2-only error, or the sealed
  * [[GraftParquetFileFormat.prepareWrite]]) — never silently.
  *
  * Conversion contract: each statement's resolved predicate/assignment
  * expressions are re-anchored BY NAME onto the table's fresh snapshot
  * (the commands run the manifest ops, which re-read and retry under
  * optimistic concurrency — expressions pinned to the statement's
  * relation exprIds would go stale across retries). Shapes the manifest
  * ops can't express fail loudly naming the programmatic API — silent
  * wrongness is the one unacceptable state. Subqueries in DML
  * predicates are rejected (conditions must be row-local; materialize
  * the subquery and use the programmatic API). */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftSqlDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(target, condition)
        if d.childrenResolved && condition.resolved &&
          graftTarget(target).isDefined =>
      val r = graftTarget(target).get
      val truncate = condition match {
        // bare `DELETE FROM t` (WHERE-less or literal-true): a dv
        // sweep would sidecar EVERY key — pathological at scale. One
        // empty-content overwrite commit is the same logical
        // transition (full-delete change window, history intact).
        case org.apache.spark.sql.catalyst.expressions
          .Literal(true, org.apache.spark.sql.types.BooleanType) => true
        case _ => false
      }
      if (truncate)
        GraftTruncateCommand(r.tablePath, r.current, targetIdent(target))
      else
        GraftDeleteCommand(r.tablePath, r.current,
          reanchor(condition, target.output), targetIdent(target))

    case u: UpdateTable if u.childrenResolved &&
        u.assignments.forall(_.resolved) &&
        u.condition.forall(_.resolved) && graftTarget(u.table).isDefined =>
      val r = graftTarget(u.table).get
      val out = u.table.output
      val set = u.assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"graft SQL UPDATE: unsupported SET target $other — only " +
            "plain columns are updatable (nested fields: use " +
            "ManifestTable.updateWhere with a struct rebuild)")
        }
        name -> reanchor(a.value, out)
      }
      GraftUpdateCommand(r.tablePath, r.current, set,
        u.condition.map(reanchor(_, out)), targetIdent(u.table))

    case m: MergeIntoTable if m.childrenResolved &&
        m.mergeCondition.resolved &&
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).forall(_.resolved) &&
        graftTarget(m.targetTable).isDefined =>
      convertMerge(m)

    case i @ InsertIntoStatement(target, parts, userCols, query,
        overwrite, ifPNE, _)
        if query.resolved && graftTarget(target).isDefined &&
          (parts.nonEmpty ||
            graftTarget(target).get.manifest.partCols.nonEmpty) =>
      // flat-table inserts ride the built-in InsertableRelation route;
      // this rule exists for the partitioned shapes that route would
      // lose to the (sealed) file-commit fallback
      val r = graftTarget(target).get
      require(!ifPNE, "graft: INSERT ... PARTITION ... IF NOT EXISTS " +
        "is not supported — partitions are manifest state, not " +
        "directories to test")
      GraftInsertCommand(r.tablePath, r.current, parts, userCols, query,
        overwrite, targetIdent(target))
  }

  private def convertMerge(m: MergeIntoTable): LogicalPlan = {
    import ManifestTable.{DeleteMatched, UpdateSet, WhenMatched}
    val r = graftTarget(m.targetTable).get
    val tOut = m.targetTable.output
    val sOut = m.sourceTable.output
    val keyCol = r.manifest.keyCol
    // the manifest merge joins strictly on the merge key: the ON
    // condition must be exactly target.key = source.<col>
    val srcKeyName = m.mergeCondition match {
      case EqualTo(l: AttributeReference, rr: AttributeReference) =>
        val (t, s) =
          if (tOut.exists(_.exprId == l.exprId)) (l, rr)
          else (rr, l)
        require(tOut.exists(_.exprId == t.exprId) &&
          sOut.exists(_.exprId == s.exprId) &&
          t.name.equalsIgnoreCase(keyCol),
          s"graft SQL MERGE: the ON condition must be " +
          s"target.$keyCol = source.<column> (got ${m.mergeCondition.sql}); " +
          "for other join shapes use ManifestTable.mergeInto")
        s.name
      case other => throw new IllegalArgumentException(
        s"graft SQL MERGE: the ON condition must be a single equality " +
        s"on the merge key '$keyCol' (got ${other.sql}); for other " +
        "shapes use ManifestTable.mergeInto")
    }
    require(m.notMatchedBySourceActions.isEmpty,
      "graft SQL MERGE: WHEN NOT MATCHED BY SOURCE is not supported — " +
      "use ManifestTable.deleteWhere / updateWhere for target-only sweeps")
    val whenMatched = m.matchedActions.map {
      case UpdateAction(cond, assignments, _) =>
        // the analyzer ALIGNS assignments to the full row (identity
        // `col = t.col` for unmentioned columns; `SET *` becomes
        // `col = s.col` for every column) — strip the no-ops: target
        // identities, and the key taken from the source key (which the
        // ON equality makes value-identical). A key assignment to
        // anything else is the one genuinely illegal shape.
        val sets = assignments.flatMap { a =>
          val name = a.key.asInstanceOf[AttributeReference].name
          a.value match {
            case ar: AttributeReference
                if tOut.exists(_.exprId == ar.exprId) &&
                  ar.name.equalsIgnoreCase(name) => None
            case ar: AttributeReference
                if name.equalsIgnoreCase(keyCol) &&
                  sOut.exists(_.exprId == ar.exprId) &&
                  ar.name.equalsIgnoreCase(srcKeyName) => None
            case _ if name.equalsIgnoreCase(keyCol) =>
              throw new IllegalArgumentException(
                s"graft SQL MERGE: the merge key '$keyCol' is not " +
                "updatable — delete + insert instead")
            case v => Some(name -> tsCol(v, tOut, sOut))
          }
        }.toMap
        require(sets.nonEmpty, "graft SQL MERGE: UPDATE SET resolves " +
          "to an identity update (no column changes)")
        WhenMatched(cond.map(tsCol(_, tOut, sOut)), UpdateSet(sets))
      case _: UpdateStarAction =>
        // pre-alignment SET * — every non-key column from the source
        WhenMatched(None, UpdateSet(
          r.manifest.schema.fieldNames.filterNot(_ == keyCol)
            .map(n => n -> col(s"s.$n")).toMap))
      case DeleteAction(cond) =>
        WhenMatched(cond.map(tsCol(_, tOut, sOut)), DeleteMatched)
      case other => throw new IllegalArgumentException(
        s"graft SQL MERGE: unsupported WHEN MATCHED action $other")
    }
    val insertUnmatched = m.notMatchedActions match {
      case Seq() => false
      case Seq(a) =>
        val cond = a match {
          case InsertAction(c, asg) =>
            // only the INSERT * shape (each target column from the
            // same-named source column) maps onto the manifest merge,
            // whose inserts take the source row verbatim
            asg.foreach { as =>
              val tn = as.key.asInstanceOf[AttributeReference].name
              as.value match {
                case sr: AttributeReference
                    if sOut.exists(_.exprId == sr.exprId) &&
                      sr.name.equalsIgnoreCase(tn) => ()
                case other => throw new IllegalArgumentException(
                  s"graft SQL MERGE: INSERT value for '$tn' must be the " +
                  s"same-named source column (got ${other.sql}); derive " +
                  "the column in the source query, or use " +
                  "ManifestTable.mergeInto")
              }
            }
            c
          case _: InsertStarAction => None
          case other => throw new IllegalArgumentException(
            s"graft SQL MERGE: unsupported WHEN NOT MATCHED action $other")
        }
        require(cond.isEmpty, "graft SQL MERGE: a conditional WHEN NOT " +
          "MATCHED THEN INSERT is not supported — filter the source " +
          "query instead, or use ManifestTable.mergeInto")
        true
      case _ => throw new IllegalArgumentException(
        "graft SQL MERGE: at most one WHEN NOT MATCHED clause is " +
        "supported")
    }
    GraftMergeCommand(r.tablePath, r.current, m.sourceTable, srcKeyName,
      whenMatched, insertUnmatched, targetIdent(m.targetTable))
  }
}

private[io] object GraftSqlDml {

  /** The graft snapshot relation under a (possibly aliased) DML target. */
  def graftTarget(plan: LogicalPlan): Option[GraftSnapshotRelation] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case lr: LogicalRelation => lr.relation match {
        case g: GraftSnapshotRelation => Some(g)
        case _ => None
      }
      case _ => None
    }

  /** The target's catalog identifier, when it resolved by name — lets
    * the commands invalidate exactly one cached relation instead of
    * the whole session cache. */
  def targetIdent(plan: LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.TableIdentifier] =
    plan match {
      case SubqueryAlias(_, child) => targetIdent(child)
      case lr: LogicalRelation => lr.catalogTable.map(_.identifier)
      case _ => None
    }

  /** Re-anchor a resolved expression BY NAME: the statement's
    * AttributeReferences (bound to the DML target's relation instance)
    * become UnresolvedAttributes that re-resolve against whatever fresh
    * snapshot the manifest op reads — including across its
    * optimistic-concurrency retries. Subqueries are rejected loudly. */
  def reanchor(e: Expression, output: Seq[Attribute]): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      "graft SQL DML: subqueries in DML predicates are not supported — " +
      "materialize the subquery and use the ManifestTable API " +
      "(deleteKeys / mergeInto), or rewrite as a row-local predicate")
    val names = output.map(a => a.exprId -> a.name).toMap
    Bridge.column(expandFragile(e).transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(names.getOrElse(a.exprId, a.name))
    })
  }

  /** Expressions whose internal invariants don't survive re-anchoring
    * (they consult child dataTypes while being rebuilt): `BETWEEN`
    * resolves to a `With` common-subexpression form whose defs must
    * stay resolved — expand to the plain conjunction first. */
  private def expandFragile(e: Expression): Expression = e.transform {
    case b: org.apache.spark.sql.catalyst.expressions.Between =>
      org.apache.spark.sql.catalyst.expressions.And(
        org.apache.spark.sql.catalyst.expressions
          .GreaterThanOrEqual(b.input, b.lower),
        org.apache.spark.sql.catalyst.expressions
          .LessThanOrEqual(b.input, b.upper))
  }

  /** Merge-clause expression → a Column over [[ManifestTable.mergeInto]]'s
    * matched join (`target AS t JOIN source AS s`): target attributes
    * re-anchor as `t.<name>`, source attributes as `s.<name>`. */
  def tsCol(e: Expression, tOut: Seq[Attribute],
            sOut: Seq[Attribute]): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      "graft SQL MERGE: subqueries in merge clauses are not supported — " +
      "derive the value in the source query or use ManifestTable.mergeInto")
    val t = tOut.map(a => a.exprId -> a.name).toMap
    val s = sOut.map(a => a.exprId -> a.name).toMap
    Bridge.column(expandFragile(e).transform {
      case a: AttributeReference if t.contains(a.exprId) =>
        UnresolvedAttribute(Seq("t", t(a.exprId)))
      case a: AttributeReference if s.contains(a.exprId) =>
        UnresolvedAttribute(Seq("s", s(a.exprId)))
    })
  }

  def requireCurrent(current: Boolean, path: String, what: String): Unit =
    require(current, s"graft: cannot $what a TIME-TRAVEL snapshot of " +
      s"$path — load the table without versionAsOf/timestampAsOf")

  /** Post-commit: the session catalog caches resolved relations pinned
    * to the pre-DML snapshot — drop the TARGET's entry so the next
    * query re-resolves (path-resolved targets have no cache entry to
    * drop; other tables' entries are untouched — at scale a busy
    * session must not re-resolve its whole catalog per DML statement). */
  def invalidate(spark: SparkSession,
                 ident: Option[org.apache.spark.sql.catalyst
                   .TableIdentifier]): Unit =
    ident.foreach(spark.sessionState.catalog.invalidateCachedTable)
}

/** `DELETE FROM t WHERE cond` → [[ManifestTable.deleteWhere]] (one
  * deletion-vector commit, stats/bloom-pruned match read, coverage
  * proofs drop whole files metadata-only). */
case class GraftDeleteCommand(path: String, current: Boolean,
                              cond: Column,
                              ident: Option[org.apache.spark.sql.catalyst
                                .TableIdentifier])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "DELETE from")
    val st = ManifestTable.deleteWhere(spark, path, cond)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(st.deadMarked))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** Bare `DELETE FROM t` → [[ManifestTable.overwriteData]] with empty
  * content: ONE versioned commit whose change window is the full
  * delete, no per-key sidecar (a dv sweep would record every key). */
case class GraftTruncateCommand(path: String, current: Boolean,
                                ident: Option[org.apache.spark.sql
                                  .catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "DELETE from")
    val m = ManifestTable.readManifest(spark, path)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), m.schema)
    ManifestTable.overwriteData(spark, path, empty, numFiles = 1)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(-1L))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** `UPDATE t SET ... WHERE cond` → [[ManifestTable.updateWhere]] (post-
  * images appended + old images dead in sidecars, one dv commit). */
case class GraftUpdateCommand(path: String, current: Boolean,
                              set: Seq[(String, Column)],
                              cond: Option[Column],
                              ident: Option[org.apache.spark.sql.catalyst
                                .TableIdentifier])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "UPDATE")
    val st = ManifestTable.updateWhere(spark, path,
      cond.getOrElse(lit(true)), set.toMap)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(st.deadMarked))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("updated_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** `MERGE INTO t USING s ON t.key = s.k WHEN ...` →
  * [[ManifestTable.mergeInto]] (conditional clause algebra, first-match-
  * wins, one copy-on-write commit over the touched files only). */
case class GraftMergeCommand(path: String, current: Boolean,
                             source: LogicalPlan, srcKeyName: String,
                             whenMatched: Seq[ManifestTable.WhenMatched],
                             insertUnmatched: Boolean,
                             ident: Option[org.apache.spark.sql.catalyst
                               .TableIdentifier])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "MERGE into")
    val m = ManifestTable.readManifest(spark, path)
    val src0 = Bridge.ofRows(spark, source)
    val src =
      if (srcKeyName == m.keyCol) src0
      else {
        require(!src0.columns.contains(m.keyCol),
          s"graft SQL MERGE: the source carries both '$srcKeyName' " +
          s"(the ON key) and an unrelated column named '${m.keyCol}' — " +
          "rename one; the manifest merge joins the source by the " +
          "target's key name")
        src0.withColumnRenamed(srcKeyName, m.keyCol)
      }
    val st = ManifestTable.mergeInto(spark, path, src, whenMatched,
      insertUnmatched = insertUnmatched)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(st.version))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** Partitioned-table `INSERT INTO` / `INSERT OVERWRITE` (with optional
  * static `PARTITION (col=value)` spec) → [[ManifestTable.merge]] /
  * [[ManifestTable.overwriteData]]. The flat-table statements take the
  * built-in `InsertableRelation` route instead; this command exists
  * because Spark's insert preprocessing converts partitioned relations
  * to the (sealed) file-commit plan. A static partition spec with
  * `overwrite` replaces EXACTLY that partition (delete + upsert, two
  * commits); without `overwrite` the static value is appended to each
  * row. */
case class GraftInsertCommand(path: String, current: Boolean,
                              parts: Map[String, Option[String]],
                              userCols: Seq[String], query: LogicalPlan,
                              overwrite: Boolean,
                              ident: Option[org.apache.spark.sql.catalyst
                                .TableIdentifier])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "INSERT into")
    val m = ManifestTable.readManifest(spark, path)
    require(m.partCols.nonEmpty || parts.isEmpty,
      s"graft: table at $path is not partitioned but the insert " +
      "carried a partition spec")
    val badKeys = parts.keys.filterNot(k =>
      m.partCols.exists(_.equalsIgnoreCase(k)))
    require(badKeys.isEmpty,
      s"graft: PARTITION spec names ${badKeys.mkString(",")} but the " +
      s"table is partitioned by '${m.partCols.mkString(",")}'")
    // static assignments (`PARTITION (c=v)`) fill their columns from
    // the clause; dynamic entries (`PARTITION (c)`) and unspecified
    // levels come from the rows
    val statics: Seq[(org.apache.spark.sql.types.StructField, String)] =
      m.partCols.flatMap { pc =>
        parts.collectFirst {
          case (k, Some(v)) if k.equalsIgnoreCase(pc) => m.schema(pc) -> v
        }
      }
    val staticNames = statics.map(_._1.name).toSet
    // columns the query must supply, in table order
    val needed = m.schema.fields.filterNot(f => staticNames(f.name))
    val df0 = Bridge.ofRows(spark, query)
    val aligned =
      if (userCols.nonEmpty) {
        require(userCols.length == df0.columns.length,
          s"graft: INSERT names ${userCols.length} column(s) but the " +
          s"query produces ${df0.columns.length}")
        val byName = userCols.map(_.toLowerCase)
          .zip(df0.columns).toMap
        val missing = needed.map(_.name)
          .filterNot(n => byName.contains(n.toLowerCase))
        require(missing.isEmpty,
          s"graft: INSERT must supply every table column " +
          s"(no DEFAULTs); missing: ${missing.mkString(",")}")
        df0.select(needed.map(f =>
          col(byName(f.name.toLowerCase)).cast(f.dataType)
            .as(f.name)).toSeq: _*)
      } else {
        require(df0.columns.length == needed.length,
          s"graft: INSERT query produces ${df0.columns.length} " +
          s"column(s) but the table needs ${needed.length} " +
          s"(${needed.map(_.name).mkString(",")})")
        df0.select(needed.zip(df0.columns).map { case (f, c) =>
          col(c).cast(f.dataType).as(f.name) }.toSeq: _*)
      }
    val full =
      if (statics.isEmpty) aligned
      else statics.foldLeft(aligned) { case (d, (f, v)) =>
        d.withColumn(f.name, lit(v).cast(f.dataType))
      }.select(m.schema.fieldNames.map(col).toSeq: _*)
    if (overwrite) {
      if (statics.nonEmpty) {
        // INSERT OVERWRITE PARTITION (c=v, ...): replace exactly the
        // addressed slice — dv-delete its rows, then upsert the new
        // content (a partial spec addresses the whole sub-tree)
        val cond = statics.map { case (f, v) =>
          col(f.name) === lit(v).cast(f.dataType) }.reduce(_ && _)
        ManifestTable.deleteWhere(spark, path, cond)
        ManifestTable.merge(spark, path, full)
      } else ManifestTable.overwriteData(spark, path, full)
    } else ManifestTable.merge(spark, path, full)
    GraftSqlDml.invalidate(spark, ident)
    Seq.empty
  }
}
