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
  * wrongness is the one unacceptable state.
  *
  * Subqueries in DELETE/UPDATE predicates (`WHERE k IN (SELECT …)`,
  * `EXISTS`, `NOT IN`, including correlated forms) route through a
  * MATERIALIZING command instead: the matched rows are planned as an
  * ordinary `Filter` over the statement's snapshot — Spark's own
  * subquery rewrite turns the predicate into semi/anti joins — and the
  * matched keys (DELETE) or post-images (UPDATE) land through one
  * deletion-vector commit. The predicate is therefore evaluated ONCE
  * against the statement's snapshot, not re-derived per concurrency
  * retry (the row-local path's re-anchoring has no meaning for a plan
  * that joins other tables); the commit itself still carries the full
  * optimistic-concurrency protocol. Subqueries inside UPDATE SET
  * values or MERGE clauses stay rejected loudly. */
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
      else if (condition.exists(_.isInstanceOf[SubqueryExpression]))
        // IN/EXISTS/NOT IN (correlated included): plan the matched rows
        // as a Filter over the statement's snapshot — Spark's subquery
        // rewrite does the semi/anti joins — and dv-delete their keys
        GraftSubqueryDeleteCommand(r.tablePath, r.current,
          Filter(condition, target), r.manifest.keyCol,
          targetIdent(target))
      else
        GraftDeleteCommand(r.tablePath, r.current,
          reanchor(condition, target.output), targetIdent(target))

    case u: UpdateTable if u.childrenResolved &&
        u.assignments.forall(_.resolved) &&
        u.condition.forall(_.resolved) && graftTarget(u.table).isDefined =>
      val r = graftTarget(u.table).get
      val out = u.table.output
      val names = u.assignments.map { a =>
        a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"graft SQL UPDATE: unsupported SET target $other — only " +
            "plain columns are updatable (nested fields: use " +
            "ManifestTable.updateWhere with a struct rebuild)")
        }
      }
      if (u.condition.exists(_.exists(_.isInstanceOf[SubqueryExpression]))) {
        // subquery in WHERE: materialize the matched rows (Filter over
        // the statement snapshot) and land their post-images as one dv
        // upsert. SET values stay row-local (reanchor rejects
        // subqueries there).
        val set = names.zip(u.assignments).map { case (n, a) =>
          n -> reanchor(a.value, out) }
        GraftSubqueryUpdateCommand(r.tablePath, r.current, set,
          Filter(u.condition.get, u.table), r.manifest.keyCol,
          targetIdent(u.table))
      } else {
        val set = names.zip(u.assignments).map { case (n, a) =>
          n -> reanchor(a.value, out) }
        GraftUpdateCommand(r.tablePath, r.current, set,
          u.condition.map(reanchor(_, out)), targetIdent(u.table))
      }

    case m: MergeIntoTable if m.childrenResolved &&
        m.mergeCondition.resolved &&
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).forall(_.resolved) &&
        graftTarget(m.targetTable).isDefined =>
      convertMerge(m)

    case i @ InsertIntoStatement(target, parts, userCols, query,
        overwrite, ifPNE, byName)
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
        overwrite, targetIdent(target), byName)

    // not a conversion — bookkeeping: remember which catalog names
    // resolve to which graft paths, so InsertableRelation.insert can
    // invalidate exactly the target's relation-cache entries instead
    // of the whole session cache
    case lr: LogicalRelation if lr.catalogTable.isDefined &&
        lr.relation.isInstanceOf[GraftSnapshotRelation] =>
      GraftNameRegistry.record(
        lr.relation.asInstanceOf[GraftSnapshotRelation].tablePath,
        lr.catalogTable.get.identifier)
      lr
  }

  private def convertMerge(m: MergeIntoTable): LogicalPlan = {
    import ManifestTable.{DeleteMatched, UpdateSet, WhenMatched}
    val r = graftTarget(m.targetTable).get
    val tOut = m.targetTable.output
    val sOut = m.sourceTable.output
    val keyCol = r.manifest.keyCol
    // the manifest merge joins strictly on the merge key: the ON
    // condition must CONTAIN exactly one target.key = source.<col>
    // equality conjunct. EXTRA conjuncts are allowed when the statement
    // has no NOT MATCHED branch of either kind — then "key matches but
    // the extra condition fails" ≡ "matched, no clause fires" (row
    // carried, source row ignored), so folding the extras into every
    // matched clause's condition is exact. With NOT MATCHED branches
    // the equivalence breaks (such a row would insert — a key-unique
    // violation here anyway) — refuse loudly naming the API.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, rr) =>
        conjuncts(l) ++ conjuncts(rr)
      case other => Seq(other)
    }
    def keyEq(e: Expression): Option[String] = e match {
      case EqualTo(l: AttributeReference, rr: AttributeReference) =>
        val (t, s) =
          if (tOut.exists(_.exprId == l.exprId)) (l, rr)
          else (rr, l)
        if (tOut.exists(_.exprId == t.exprId) &&
          sOut.exists(_.exprId == s.exprId) &&
          t.name.equalsIgnoreCase(keyCol)) Some(s.name) else None
      case _ => None
    }
    val onParts = conjuncts(m.mergeCondition)
    val (keyParts, extraParts) = onParts.partition(keyEq(_).isDefined)
    require(keyParts.length == 1,
      s"graft SQL MERGE: the ON condition must contain exactly one " +
      s"equality on the merge key '$keyCol' " +
      s"(got ${m.mergeCondition.sql}); for other join shapes use " +
      "ManifestTable.mergeInto")
    require(extraParts.isEmpty || (m.notMatchedActions.isEmpty &&
      m.notMatchedBySourceActions.isEmpty),
      s"graft SQL MERGE: extra ON conjuncts " +
      s"(${extraParts.map(_.sql).mkString(" AND ")}) compose with WHEN " +
      "MATCHED clauses only — with NOT MATCHED branches their " +
      "semantics diverge from the keyed merge; filter the source or " +
      "use ManifestTable.mergeInto")
    val srcKeyName = keyEq(keyParts.head).get
    // the command renames a differently-named source key onto the
    // target's key name before the manifest merge — clause references
    // to it must follow ([[tsCol]]'s srcRename)
    val rn =
      if (srcKeyName.equalsIgnoreCase(keyCol)) None
      else Some(srcKeyName -> keyCol)
    // extra ON conjuncts, folded into every matched clause below (the
    // no-NOT-MATCHED equivalence proved above)
    val extraCond: Option[Column] = extraParts
      .reduceOption(org.apache.spark.sql.catalyst.expressions.And)
      .map(tsCol(_, tOut, sOut, rn))
    def withExtra(cond: Option[Column]): Option[Column] = (extraCond, cond) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (a, b) => a.orElse(b)
    }
    // WHEN NOT MATCHED BY SOURCE: target-only clauses, first-match-wins
    // — the manifest merge evaluates them over the anti-joined target
    // rows (`t.` columns only; the analyzer already forbade source
    // references here). The clause forces a full-target read and
    // disables the cheap disjoint rebase (see mergeInto's scaladoc).
    val whenNms = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, assignments, _) =>
        val sets = assignments.flatMap { a =>
          val name = a.key.asInstanceOf[AttributeReference].name
          a.value match {
            case ar: AttributeReference
                if tOut.exists(_.exprId == ar.exprId) &&
                  ar.name.equalsIgnoreCase(name) => None
            case _ if name.equalsIgnoreCase(keyCol) =>
              throw new IllegalArgumentException(
                s"graft SQL MERGE: the merge key '$keyCol' is not " +
                "updatable — delete + insert instead")
            case v => Some(name -> tsCol(v, tOut, sOut, rn))
          }
        }.toMap
        require(sets.nonEmpty, "graft SQL MERGE: NOT MATCHED BY SOURCE " +
          "UPDATE SET resolves to an identity update (no column changes)")
        ManifestTable.WhenMatched(cond.map(tsCol(_, tOut, sOut, rn)),
          ManifestTable.UpdateSet(sets))
      case DeleteAction(cond) =>
        ManifestTable.WhenMatched(cond.map(tsCol(_, tOut, sOut, rn)),
          ManifestTable.DeleteMatched)
      case other => throw new IllegalArgumentException(
        s"graft SQL MERGE: unsupported WHEN NOT MATCHED BY SOURCE " +
        s"action $other")
    }
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
            case v => Some(name -> tsCol(v, tOut, sOut, rn))
          }
        }.toMap
        require(sets.nonEmpty, "graft SQL MERGE: UPDATE SET resolves " +
          "to an identity update (no column changes)")
        WhenMatched(withExtra(cond.map(tsCol(_, tOut, sOut, rn))),
          UpdateSet(sets))
      case _: UpdateStarAction =>
        // pre-alignment SET * — every non-key column from the source
        WhenMatched(withExtra(None), UpdateSet(
          r.manifest.schema.fieldNames.filterNot(_ == keyCol)
            .map(n => n -> col(s"s.$n")).toMap))
      case DeleteAction(cond) =>
        WhenMatched(withExtra(cond.map(tsCol(_, tOut, sOut, rn))),
          DeleteMatched)
      case other => throw new IllegalArgumentException(
        s"graft SQL MERGE: unsupported WHEN MATCHED action $other")
    }
    val (insertUnmatched, insertCond) = m.notMatchedActions match {
      case Seq() => (false, None)
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
                      (sr.name.equalsIgnoreCase(tn) ||
                        // the key arrives under the source's own name;
                        // the command's rename makes them one column
                        (tn.equalsIgnoreCase(keyCol) &&
                          sr.name.equalsIgnoreCase(srcKeyName))) => ()
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
        // a conditional insert gates ONLY the unmatched rows (matched
        // processing never sees the condition) — exactly mergeInto's
        // insertCond contract; the condition references source columns
        (true, cond.map(tsCol(_, tOut, sOut, rn)))
      case _ => throw new IllegalArgumentException(
        "graft SQL MERGE: at most one WHEN NOT MATCHED clause is " +
        "supported")
    }
    GraftMergeCommand(r.tablePath, r.current, m.sourceTable, srcKeyName,
      whenMatched, insertUnmatched, insertCond, whenNms,
      targetIdent(m.targetTable))
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
    * re-anchor as `t.<name>`, source attributes as `s.<name>`.
    * `srcRename` maps a differently-named source key column onto the
    * target's key name — [[GraftMergeCommand]] renames the source
    * before the manifest merge, so clause references must follow. */
  def tsCol(e: Expression, tOut: Seq[Attribute],
            sOut: Seq[Attribute],
            srcRename: Option[(String, String)] = None): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      "graft SQL MERGE: subqueries in merge clauses are not supported — " +
      "derive the value in the source query or use ManifestTable.mergeInto")
    val t = tOut.map(a => a.exprId -> a.name).toMap
    val s = sOut.map(a => a.exprId -> a.name).toMap
    def srcName(n: String): String = srcRename match {
      case Some((from, to)) if n.equalsIgnoreCase(from) => to
      case _ => n
    }
    Bridge.column(expandFragile(e).transform {
      case a: AttributeReference if t.contains(a.exprId) =>
        UnresolvedAttribute(Seq("t", t(a.exprId)))
      case a: AttributeReference if s.contains(a.exprId) =>
        UnresolvedAttribute(Seq("s", srcName(s(a.exprId))))
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
    // per-entry `rows` is the LIVE count (dv commits decrement it), so
    // the manifest sums to the exact deleted-row figure driver-side —
    // no data read (Delta parity: truncate reports the real count)
    Seq(Row(m.entries.map(_.rows).sum))
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
  * wins, one copy-on-write commit over the touched files only —
  * full-target when NOT MATCHED BY SOURCE clauses are present). The
  * manifest merge verifies source key-uniqueness for the SQL tier
  * (Delta's cardinality check): a duplicate source key would fan one
  * target row into several post-images, silently breaking the table's
  * key-unique invariant. */
case class GraftMergeCommand(path: String, current: Boolean,
                             source: LogicalPlan, srcKeyName: String,
                             whenMatched: Seq[ManifestTable.WhenMatched],
                             insertUnmatched: Boolean,
                             insertCond: Option[Column],
                             whenNotMatchedBySource:
                               Seq[ManifestTable.WhenMatched],
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
      insertUnmatched = insertUnmatched, insertCond = insertCond,
      whenNotMatchedBySource = whenNotMatchedBySource,
      assertSourceUnique = true)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(st.version))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** DELETE whose WHERE carries a subquery (`k IN (SELECT …)`, `EXISTS`,
  * `NOT IN` — correlated included): the matched rows are the Filter
  * plan over the statement's snapshot (Spark's optimizer rewrites the
  * predicate into semi/anti joins — the distributed plan, never a
  * driver loop), their keys land through ONE deletion-vector commit
  * ([[ManifestTable.deleteKeysDV]]). The predicate is evaluated against
  * the statement snapshot; the commit retries under the usual
  * optimistic-concurrency protocol. */
case class GraftSubqueryDeleteCommand(path: String, current: Boolean,
                                      matched: LogicalPlan, keyCol: String,
                                      ident: Option[org.apache.spark.sql
                                        .catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(matched)
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "DELETE from")
    val keys = Bridge.ofRows(spark, matched).select(col(keyCol))
    val st = ManifestTable.deleteKeysDV(spark, path, keys)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(st.deadMarked))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** UPDATE whose WHERE carries a subquery: matched rows materialize from
  * the Filter plan over the statement's snapshot, their post-images
  * (SET expressions see the row's current values) land as ONE
  * deletion-vector upsert ([[ManifestTable.upsertDV]] — old images die
  * in sidecars, post-images append). SET values themselves must stay
  * row-local. */
case class GraftSubqueryUpdateCommand(path: String, current: Boolean,
                                      set: Seq[(String, Column)],
                                      matched: LogicalPlan, keyCol: String,
                                      ident: Option[org.apache.spark.sql
                                        .catalyst.TableIdentifier])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(matched)
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlDml.requireCurrent(current, path, "UPDATE")
    val setMap = set.toMap
    require(!setMap.keys.exists(_.equalsIgnoreCase(keyCol)),
      s"graft SQL UPDATE: the merge key '$keyCol' is not updatable — " +
      "delete + insert instead")
    val m = ManifestTable.readManifest(spark, path)
    val rows = Bridge.ofRows(spark, matched)
    val post = rows.select(m.schema.fieldNames.map(f =>
      setMap.get(f).map(_.as(f)).getOrElse(col(f))).toSeq: _*)
    val st = ManifestTable.upsertDV(spark, path, post)
    GraftSqlDml.invalidate(spark, ident)
    Seq(Row(st.deadMarked))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("updated_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
}

/** Partitioned-table `INSERT INTO` / `INSERT OVERWRITE` (with optional
  * static `PARTITION (col=value)` spec, or `BY NAME`) →
  * [[ManifestTable.merge]] / [[ManifestTable.replaceWhere]] /
  * [[ManifestTable.overwritePartitions]] / [[ManifestTable
  * .overwriteData]]. The flat-table statements take the built-in
  * `InsertableRelation` route instead; this command exists because
  * Spark's insert preprocessing converts partitioned relations to the
  * (sealed) file-commit plan.
  *
  * OVERWRITE semantics follow Spark's `partitionOverwriteMode`:
  *   - static (default) with a `PARTITION (c=v, …)` spec replaces
  *     EXACTLY the addressed slice — one atomic [[ManifestTable
  *     .replaceWhere]] commit (a reader never observes the gap a
  *     delete-then-insert pair would open); a partial spec addresses
  *     the whole sub-tree. Without a spec, the whole table is
  *     replaced ([[ManifestTable.overwriteData]]).
  *   - dynamic (session conf `spark.sql.sources
  *     .partitionOverwriteMode=dynamic`, honored — not silently
  *     ignored) replaces exactly the partition tuples PRESENT in the
  *     batch ([[ManifestTable.overwritePartitions]]); static spec
  *     levels pin their values, the rest come from the rows.
  *
  * The batch must be key-unique: internal duplicates would land as an
  * undefined last-writer-wins through the keyed upsert, so they fail
  * loudly naming the keys. */
case class GraftInsertCommand(path: String, current: Boolean,
                              parts: Map[String, Option[String]],
                              userCols: Seq[String], query: LogicalPlan,
                              overwrite: Boolean,
                              ident: Option[org.apache.spark.sql.catalyst
                                .TableIdentifier],
                              byName: Boolean = false)
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
      if (byName) {
        // `INSERT … BY NAME`: the QUERY's output names align the
        // columns — positional alignment here would silently swap
        // same-typed columns, the one unacceptable state
        require(userCols.isEmpty,
          "graft: INSERT BY NAME cannot also name a column list")
        val lower = df0.columns.groupBy(_.toLowerCase)
        val dup = lower.collect { case (n, cs) if cs.length > 1 => n }
        require(dup.isEmpty, s"graft: INSERT BY NAME query emits " +
          s"ambiguous column name(s): ${dup.mkString(",")}")
        val byN = lower.map { case (n, cs) => n -> cs.head }
        val missing = needed.map(_.name)
          .filterNot(n => byN.contains(n.toLowerCase))
        require(missing.isEmpty,
          s"graft: INSERT BY NAME must supply every table column " +
          s"(no DEFAULTs); missing: ${missing.mkString(",")}")
        val extra = df0.columns.filterNot(c =>
          needed.exists(_.name.equalsIgnoreCase(c)))
        require(extra.isEmpty, s"graft: INSERT BY NAME query emits " +
          s"column(s) the table lacks: ${extra.mkString(",")}")
        df0.select(needed.map(f =>
          col(byN(f.name.toLowerCase)).cast(f.dataType)
            .as(f.name)).toSeq: _*)
      } else if (userCols.nonEmpty) {
        require(userCols.length == df0.columns.length,
          s"graft: INSERT names ${userCols.length} column(s) but the " +
          s"query produces ${df0.columns.length}")
        val byN = userCols.map(_.toLowerCase)
          .zip(df0.columns).toMap
        val missing = needed.map(_.name)
          .filterNot(n => byN.contains(n.toLowerCase))
        require(missing.isEmpty,
          s"graft: INSERT must supply every table column " +
          s"(no DEFAULTs); missing: ${missing.mkString(",")}")
        df0.select(needed.map(f =>
          col(byN(f.name.toLowerCase)).cast(f.dataType)
            .as(f.name)).toSeq: _*)
      } else {
        require(df0.columns.length == needed.length,
          s"graft: INSERT query produces ${df0.columns.length} " +
          s"column(s) but the table needs ${needed.length} " +
          s"(${needed.map(_.name).mkString(",")})")
        df0.select(needed.zip(df0.columns).map { case (f, c) =>
          col(c).cast(f.dataType).as(f.name) }.toSeq: _*)
      }
    val full0 =
      if (statics.isEmpty) aligned
      else statics.foldLeft(aligned) { case (d, (f, v)) =>
        d.withColumn(f.name, lit(v).cast(f.dataType))
      }.select(m.schema.fieldNames.map(col).toSeq: _*)
    // the batch feeds a uniqueness probe plus the commit's own jobs —
    // pin it so the insert query runs once
    val full = full0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dups = full.groupBy(col(m.keyCol))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(5)
        .collect().map(_.get(0)).mkString(", ")
      require(dups.isEmpty, s"graft: INSERT batch is not key-unique " +
        s"on '${m.keyCol}' — duplicate key(s): $dups … (the keyed " +
        "upsert would apply an undefined last-writer-wins; " +
        "de-duplicate the query)")
      val dynamicMode = spark.conf
        .get("spark.sql.sources.partitionOverwriteMode", "static")
        .equalsIgnoreCase("dynamic")
      if (overwrite) {
        if (m.partCols.nonEmpty && dynamicMode)
          ManifestTable.overwritePartitions(spark, path, full)
        else if (statics.nonEmpty) {
          val cond = statics.map { case (f, v) =>
            col(f.name) === lit(v).cast(f.dataType) }.reduce(_ && _)
          ManifestTable.replaceWhere(spark, path, cond, full)
        } else ManifestTable.overwriteData(spark, path, full)
      } else ManifestTable.merge(spark, path, full)
    } finally full.unpersist(blocking = false)
    GraftSqlDml.invalidate(spark, ident)
    Seq.empty
  }
}
