package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualTo, Expression, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, SnapshotTable}

/** SQL row-level DML over snapshot tables — `MERGE INTO` and
  * `UPDATE`, the two statements the connector's `SupportsDelete`
  * surface cannot carry (Spark routes them through
  * `SupportsRowLevelOperations`, whose group-based write path has no
  * V1 fallback). Instead [[GraftDmlRule]] intercepts the ANALYZED
  * `MergeIntoTable` / `UpdateTable` over a [[GraftTable]] (Spark's own
  * row-level rewrite only matches `SupportsRowLevelOperations` tables,
  * so the nodes survive resolution untouched) and replaces them with
  * eager commands that run the library's scale-safe writers:
  *
  *   - MERGE (upsert shape: `WHEN MATCHED UPDATE` + `WHEN NOT MATCHED
  *     INSERT`, both full-row and identical) →
  *     [[SnapshotTable.upsertMor]] — the O(batch) append +
  *     equality-delete commit; zero table reads, zero rewrites.
  *   - UPDATE → [[SnapshotTable.updateWhere]] — a partition-pruned
  *     copy-on-write delta commit.
  *
  * Shapes outside the contract REFUSE with the supported form in the
  * error (running the wrong rows is not an optimization miss).
  * Reference analog: `processing/spark_jobs/bronze_to_silver.py:156-188`
  * runs exactly this MERGE through Spark SQL on Iceberg. */
object GraftDml {

  /** Where a DML statement lands: a plain warehouse table (commits
    * publish via the table marker) or a governed table (commits
    * publish as atomic catalog commits). */
  sealed trait Target { def tableRoot: String }
  case class Warehouse(tableRoot: String) extends Target
  case class Governed(catalogRoot: String, table: String) extends Target {
    def tableRoot: String = Catalog.tableRoot(catalogRoot, table)
  }

  private[sources] def baseVersion(t: Target): Long = t match {
    case Warehouse(r) => SnapshotTable.latestVersion(r)
    case g: Governed => Catalog.tableVersions(g.catalogRoot)(g.table)
  }

  /** MERGE upsert through the O(batch) MoR path. The SQL contract
    * (validated by the rule) guarantees the batch is the full
    * replacement/insert row set; the cardinality check here is the
    * runtime half of SQL MERGE's "a target row may match at most one
    * source row" rule — duplicate source keys would otherwise BOTH
    * survive in the appended batch. Governed targets publish as ONE
    * atomic catalog commit, CAS-retried against concurrent committers
    * (the [[graft.streaming.GovernedStream]] protocol minus the batch
    * id). Returns the new version (warehouse) / commit (governed). */
  def runMerge(spark: SparkSession, target: Target, partitionCol: String,
               keyCols: Seq[String], batch: DataFrame,
               syncDelete: Boolean = false): Long = {
    val schema = SnapshotTable.read(spark, target.tableRoot,
      baseVersion(target)).schema
    val aligned = batch.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val dups = aligned.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"MERGE cardinality violation: duplicate source key " +
        s"${dups.head.toSeq.init.mkString("(", ", ", ")")} — a target " +
        "row may match at most one source row")
    // WHEN NOT MATCHED BY SOURCE THEN DELETE (the full-sync shape):
    // target keys absent from the source land as a SECOND
    // equality-delete sidecar — one key-column scan of the base (the
    // semantics demand knowing what the source lacks), still zero data
    // rewrites, computed ONCE (persisted across the emptiness probe
    // and the sidecar write). NULL keys need care: the eq-delete
    // sidecar matches NULL-SAFELY against every file older than its
    // version — including the just-appended batch — so a NULL-key
    // tombstone is only safe when the BATCH carries no NULL-key row;
    // otherwise the statement refuses rather than silently deleting
    // the row it just inserted. Non-null anti keys are disjoint from
    // the batch's keys by construction.
    def antiKeys(base: Long): DataFrame = {
      val keyIsNull = keyCols.map(col(_).isNull).reduce(_ || _)
      val baseKeys = SnapshotTable.read(spark, target.tableRoot, base)
        .select(keyCols.map(col): _*).distinct()
      // a NULL-key target row matches no source row (standard MERGE
      // equality), so NOT MATCHED BY SOURCE always deletes it
      val nullTargets = baseKeys.filter(keyIsNull)
      val antiStd = baseKeys.filter(!keyIsNull)
        .join(aligned.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
      val anti = antiStd.unionByName(nullTargets).persist()
      if (!nullTargets.isEmpty &&
          !aligned.filter(keyIsNull).isEmpty) {
        anti.unpersist()
        throw new UnsupportedOperationException(
          "MERGE ... NOT MATCHED BY SOURCE DELETE with NULL merge keys " +
            "on BOTH sides: the equality-delete tombstone for the " +
            "target's NULL-key rows would also mask the batch's " +
            "NULL-key insert — delete the NULL-key rows explicitly " +
            "first")
      }
      anti
    }
    target match {
      case Warehouse(root) =>
        if (!syncDelete)
          SnapshotTable.upsertMor(spark, root, partitionCol, aligned, keyCols)
        else {
          val base = baseVersion(target)
          val anti = antiKeys(base)
          try {
            val d1 = SnapshotTable.stageUpsertMor(aligned, root,
              partitionCol, keyCols, base)
            // both halves stage unpublished, ONE marker move publishes
            // — a reader never sees the upserts without the
            // sync-deletes
            val head =
              if (anti.isEmpty) d1
              else SnapshotTable.stageEqualityDelete(spark, root, anti, d1)
            SnapshotTable.moveMarker(root, head)
            head
          } finally anti.unpersist()
        }
      case g: Governed =>
        casCommit(g) { prev =>
          if (!syncDelete)
            Some(SnapshotTable.stageUpsertMor(aligned, g.tableRoot,
              partitionCol, keyCols, prev))
          else {
            // NULL-key refusal fires BEFORE anything stages
            val anti = antiKeys(prev)
            try {
              val d1 = SnapshotTable.stageUpsertMor(aligned, g.tableRoot,
                partitionCol, keyCols, prev)
              if (anti.isEmpty) Some(d1)
              else Some(SnapshotTable.stageEqualityDelete(spark,
                g.tableRoot, anti, d1))
            } finally anti.unpersist()
          }
        }
    }
  }

  /** UPDATE as a partition-pruned copy-on-write rewrite; governed
    * targets publish the staged rewrite as one atomic catalog
    * commit. */
  def runUpdate(spark: SparkSession, target: Target, partitionCol: String,
                predicate: Column, sets: Seq[(String, Column)]): Long =
    target match {
      case Warehouse(root) =>
        SnapshotTable.updateWhere(spark, root, partitionCol, predicate, sets)
      case g: Governed =>
        casCommit(g) { prev =>
          val v = SnapshotTable.stageUpdateWhere(spark, g.tableRoot,
            partitionCol, predicate, sets, prev)
          if (v < 0) None else Some(v)
        }
    }

  /** MERGE `WHEN MATCHED THEN DELETE` (alone): the source's key set
    * lands as one equality-delete sidecar commit masking every
    * matching row — O(batch), zero reads/rewrites of the table (the
    * Iceberg v2 equality-delete flavor CDC writers use for
    * tombstones). Keys cast to the target's column types so sidecar
    * resolution matches exactly. */
  def runMergeDelete(spark: SparkSession, target: Target,
                     keys: DataFrame): Long = {
    val schema = SnapshotTable.read(spark, target.tableRoot,
      baseVersion(target)).schema
    val aligned = keys.select(keys.columns.toSeq.map(c =>
      col(c).cast(schema(c).dataType).as(c)): _*)
    target match {
      case Warehouse(root) =>
        SnapshotTable.deleteEqualityMor(spark, root, aligned)
      case g: Governed =>
        casCommit(g) { prev =>
          Some(SnapshotTable.stageEqualityDelete(spark, g.tableRoot,
            aligned, prev))
        }
    }
  }

  /** DELETE as a merge-on-read sidecar commit, with the EXACT
    * analyzed predicate — the rule-routed superset of the connector's
    * `SupportsDelete` path, which can only carry predicates the strict
    * V1-filter translator renders (a `LIKE '%a%'` used to refuse;
    * the Catalyst expression IS the predicate, so nothing is lost in
    * translation). Governed targets land as one atomic catalog
    * commit ([[Catalog.transactMorDelete]]). */
  def runDelete(spark: SparkSession, target: Target,
                predicate: Column): Long = target match {
    case Warehouse(root) =>
      SnapshotTable.deleteWhereMor(spark, root, predicate)
    case g: Governed =>
      Catalog.transactMorDelete(spark, g.catalogRoot,
        Seq(g.table -> predicate))
  }

  /** Optimistic catalog-commit loop: `stage(tableBaseVersion)` stages
    * the table's next version (None = no-op), the commit CAS
    * publishes; a racing committer re-stages against the new base,
    * bounded retries. */
  private def casCommit(g: Governed)(stage: Long => Option[Long]): Long = {
    var attempt = 0
    while (true) {
      val base = Catalog.latestCommit(g.catalogRoot)
      val prev = Catalog.tableVersions(g.catalogRoot, base)
      stage(prev.getOrElse(g.table, -1L)) match {
        case None => return base
        case Some(v) =>
          try return Catalog.commitStaged(g.catalogRoot,
            Map(g.table -> v), base)
          catch {
            case e: java.util.ConcurrentModificationException =>
              attempt += 1
              if (attempt > 5) throw e
              Thread.sleep(50L * attempt)
          }
      }
    }
    -1L // unreachable
  }
}

/** The post-hoc resolution rule wiring SQL MERGE/UPDATE to
  * [[GraftDml]] — injected by [[graft.GraftExtensions]]. Validation
  * happens HERE (analysis time, loud errors); execution is the eager
  * command in `org.apache.spark.sql.graft.GraftDmlCommands`. */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import org.apache.spark.sql.graft.{GraftDeleteCommand, GraftMergeCommand, GraftMergeDeleteCommand, GraftUpdateCommand}

  /** The statement's target: (where the write lands, the relation).
    * Pinned (version/tag/branch) relations refuse — time travel is
    * read-only; DML runs against the live head. */
  private def graftTarget(plan: LogicalPlan, stmt: String)
      : Option[(GraftDml.Target, DataSourceV2Relation)] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child, stmt)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable =>
        require(!t.isPinned,
          s"$stmt against a version/tag/branch pin is read-only time " +
            "travel; run it against the live table")
        Some((GraftDml.Warehouse(t.root), r))
      case t: GraftGovernedTable =>
        require(t.writable,
          s"$stmt against a pinned/branch governed read is read-only; " +
            "run it against the latest catalog commit")
        Some((GraftDml.Governed(t.catalogRoot, t.table), r))
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable, "MERGE INTO")
          .map(t => rewriteMerge(m, t._1, t._2)).getOrElse(m)
      case u: UpdateTable if u.resolved =>
        graftTarget(u.table, "UPDATE")
          .map(t => rewriteUpdate(u, t._1, t._2)).getOrElse(u)
      case d: DeleteFromTable if d.resolved =>
        graftTarget(d.table, "DELETE FROM")
          .map(t => rewriteDelete(d, t._1)).getOrElse(d)
    }

  /** DELETE carries the full analyzed predicate to the MoR sidecar —
    * no V1-filter translation loss (the `SupportsDelete` path stays as
    * the fallback when the extensions are not loaded). Subqueries in
    * the predicate refuse: a DELETE whose row set depends on another
    * query needs MERGE semantics. */
  private def rewriteDelete(d: DeleteFromTable,
                            t: GraftDml.Target): LogicalPlan = {
    require(!d.condition.exists(_.isInstanceOf[SubqueryExpression]),
      "DELETE with a subquery predicate is not supported; materialize " +
        "the key set and MERGE, or use the library API")
    require(SnapshotTable.manifestEntries(t.tableRoot,
      GraftDml.baseVersion(t)).nonEmpty,
      "DELETE needs a manifested table (the MoR sidecar rides the " +
        "partition manifest)")
    GraftDeleteCommand(t, d.condition)
  }

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE supports the upsert shape only — ON <conjunction " +
        "of key equalities> WHEN MATCHED THEN UPDATE SET * WHEN NOT " +
        s"MATCHED THEN INSERT * (or identical explicit full-row " +
        s"assignments in both) — got: $what")

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def tableRequirements(t: GraftDml.Target, stmt: String): String =
    SnapshotTable.partitionSpec(t.tableRoot).getOrElse(
      throw new UnsupportedOperationException(
        s"$stmt needs a partitioned, manifested graft table (the " +
          "write lands as a partition-level commit); this table has " +
          "no partition spec"))

  /** assignments as (target column name → value), refusing nested or
    * conditional forms. */
  private def assignMap(actionName: String, cond: Option[Expression],
                        assigns: Seq[Assignment],
                        targetOut: Set[org.apache.spark.sql.catalyst.expressions.ExprId])
      : Map[String, Expression] = {
    require(cond.isEmpty,
      s"conditional WHEN clauses (AND <cond>) are not supported in $actionName")
    assigns.map { a =>
      a.key match {
        case ar: AttributeReference if targetOut.contains(ar.exprId) =>
          ar.name -> a.value
        case other => refuse(s"non-column assignment target $other")
      }
    }.toMap
  }

  /** The ON condition as (target column, source expression) pairs —
    * a conjunction of equalities between one bare target column and
    * one source-rooted expression; anything else refuses. */
  private def keyPairsOf(m: MergeIntoTable,
                         targetIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId])
      : Seq[(String, Expression)] = {
    val pairs = splitConjunctivePredicates(m.mergeCondition).map {
      case EqualTo(l, r) =>
        (stripCast(l), stripCast(r)) match {
          case (a: AttributeReference, s) if targetIds.contains(a.exprId) &&
            s.references.forall(ref => !targetIds.contains(ref.exprId)) =>
            a.name -> r
          case (s, a: AttributeReference) if targetIds.contains(a.exprId) &&
            s.references.forall(ref => !targetIds.contains(ref.exprId)) =>
            a.name -> l
          case other => refuse(s"ON condition $other (need target-column " +
            "= source-expression)")
        }
      case other => refuse(s"non-equality ON conjunct $other")
    }
    require(pairs.nonEmpty, "MERGE needs at least one key equality")
    pairs
  }

  private def rewriteMerge(m: MergeIntoTable, t: GraftDml.Target,
                           rel: DataSourceV2Relation): LogicalPlan = {
    val partitionCol = tableRequirements(t, "MERGE INTO")
    require(!m.withSchemaEvolution,
      "MERGE ... WITH SCHEMA EVOLUTION is not supported; evolve via " +
        "ALTER TABLE ADD/RENAME/DROP COLUMN first")
    // the one supported NOT-MATCHED-BY-SOURCE form: an unconditional
    // DELETE alongside the upsert shape — full-sync MERGE (target
    // becomes exactly the source), the second eq-delete sidecar
    val syncDelete = m.notMatchedBySourceActions match {
      case Seq() => false
      case Seq(DeleteAction(None)) => true
      case other => refuse(s"WHEN NOT MATCHED BY SOURCE actions $other " +
        "(only an unconditional THEN DELETE is supported)")
    }
    val targetIds = rel.outputSet.map(_.exprId).toSet

    // WHEN MATCHED DELETE (alone): "remove the keys the source
    // carries" — exactly an equality-delete sidecar commit, O(batch),
    // zero reads of the table
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) =>
        if (syncDelete) refuse("WHEN MATCHED DELETE combined with WHEN " +
          "NOT MATCHED BY SOURCE DELETE (that is DELETE FROM the table)")
        return GraftMergeDeleteCommand(t, m.sourceTable,
          keyPairsOf(m, targetIds))
      case _ => ()
    }

    val upd = m.matchedActions match {
      case Seq(UpdateAction(c, assigns, _)) =>
        assignMap("WHEN MATCHED", c, assigns, targetIds)
      case other => refuse(s"matched actions $other")
    }
    val ins = m.notMatchedActions match {
      case Seq(InsertAction(c, assigns)) =>
        assignMap("WHEN NOT MATCHED", c, assigns, targetIds)
      case other => refuse(s"not-matched actions $other")
    }
    val cols = rel.output.map(_.name)
    // full-row and identical: one appended row serves as both the
    // update result and the insert — the upsertMor contract
    cols.foreach { c =>
      val (u, i) = (upd.get(c), ins.get(c))
      if (u.isEmpty || i.isEmpty)
        refuse(s"partial assignment (column '$c' not set in both clauses)")
      if (u.get.canonicalized != i.get.canonicalized &&
          stripCast(u.get).canonicalized != stripCast(i.get).canonicalized)
        refuse(s"UPDATE and INSERT assign different values to '$c'")
    }
    // ON: a conjunction of target-column = source-expression
    // equalities; the batch's key value must BE the ON's source
    // expression, or the equality-delete would mask the wrong rows
    val keyCols = keyPairsOf(m, targetIds).map { case (tc, se) =>
      val assigned = upd(tc)
      require(stripCast(assigned).canonicalized ==
          stripCast(se).canonicalized,
        s"key column '$tc' must be assigned the ON " +
          s"condition's source expression (got $assigned vs $se)")
      tc
    }
    GraftMergeCommand(t, partitionCol, keyCols, m.sourceTable,
      rel.output.map(a => a.name -> upd(a.name)), syncDelete)
  }

  private def rewriteUpdate(u: UpdateTable, t: GraftDml.Target,
                            rel: DataSourceV2Relation): LogicalPlan = {
    val partitionCol = tableRequirements(t, "UPDATE")
    val targetIds = rel.outputSet.map(_.exprId).toSet
    val sets = u.assignments.map { a =>
      a.key match {
        case ar: AttributeReference if targetIds.contains(ar.exprId) =>
          ar.name -> a.value
        case other => throw new UnsupportedOperationException(
          s"UPDATE supports plain column assignments only, got $other")
      }
    }
    GraftUpdateCommand(t, partitionCol, u.condition, sets)
  }
}
