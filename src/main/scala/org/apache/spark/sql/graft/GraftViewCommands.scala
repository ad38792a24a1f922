package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchViewException
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Eager commands behind the graft VIEW DDL (`CREATE/DROP/SHOW VIEW`
  * against a [[graft.sources.GraftSqlCatalog]]): Spark 4.1 ships the
  * DSv2 `ViewCatalog` API but its analyzer still hard-refuses view DDL
  * on non-session catalogs (`MISSING_CATALOG_ABILITY.VIEWS`), so — the
  * Iceberg-extensions precedent — the graft parser intercepts the
  * parsed nodes and reroutes them here. Lives under
  * `org.apache.spark.sql` for `LeafRunnableCommand` (the
  * [[GraftDmlExec]] shim-file pattern). */
private[graft] object GraftViewExec {

  private def viewCatalog(session: SparkSession, name: String): ViewCatalog =
    session.sessionState.catalogManager.catalog(name)
      .asInstanceOf[ViewCatalog]
}

case class GraftCreateViewCommand(catalog: String, namespace: Seq[String],
                                  viewName: String, queryText: String,
                                  columnAliases: Seq[String],
                                  allowExisting: Boolean,
                                  replace: Boolean)
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val vc = session.sessionState.catalogManager.catalog(catalog)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(namespace.toArray, viewName)
    if (vc.viewExists(ident) && allowExisting) return Seq.empty
    // analyze (not execute) the defining query under the CURRENT
    // context — its schema and output names are the stored contract;
    // the stored currentCatalog/currentNamespace let the read-side
    // rule re-qualify names the definition left unqualified.
    // Validation happens BEFORE any drop: a failed OR REPLACE must
    // leave the existing view intact.
    val analyzed = session.sql(queryText)
    require(columnAliases.isEmpty ||
      columnAliases.length == analyzed.schema.length,
      s"view column list has ${columnAliases.length} names, query " +
        s"produces ${analyzed.schema.length} columns")
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(
      ident, queryText, cm.currentCatalog.name(), cm.currentNamespace,
      analyzed.schema, analyzed.schema.fieldNames,
      columnAliases.toArray, Array.fill(columnAliases.length)(null),
      java.util.Collections.emptyMap[String, String]())
    // OR REPLACE goes through replaceView — one atomic step on both
    // graft catalogs (the governed one publishes ONE catalog commit),
    // never a drop-then-create window
    if (replace) vc.replaceView(info, true)
    else vc.createView(info)
    Seq.empty
  }
}

case class GraftDropViewCommand(catalog: String, namespace: Seq[String],
                                viewName: String, ifExists: Boolean)
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val vc = session.sessionState.catalogManager.catalog(catalog)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(namespace.toArray, viewName)
    if (!vc.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Seq.empty
  }
}

case class GraftShowViewsCommand(catalog: String, namespace: Seq[String],
                                 pattern: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "namespace", org.apache.spark.sql.types.StringType)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "viewName", org.apache.spark.sql.types.StringType)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "isTemporary", org.apache.spark.sql.types.BooleanType)())

  override def run(session: SparkSession): Seq[Row] = {
    val vc = session.sessionState.catalogManager.catalog(catalog)
      .asInstanceOf[ViewCatalog]
    vc.listViews(namespace: _*).toSeq
      .filter(i => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(i.name()), p).nonEmpty))
      .sortBy(_.name())
      .map(i => Row(i.namespace().mkString("."), i.name(), false))
  }
}

/** `ALTER VIEW v AS <query>` — in-place redefinition of a persisted
  * graft view. The view must exist (this is the SQL-standard contract
  * distinguishing it from CREATE OR REPLACE); the new definition
  * publishes through `replaceView`, which on the governed catalog is
  * ONE atomic catalog commit ([[graft.operators.Catalog.putView]] with
  * replace) — time travel sees the old definition at older commits and
  * never a viewless window. Stored column aliases are cleared: the new
  * query's own output names become the contract, like Spark's ALTER
  * VIEW AS on session-catalog views. */
case class GraftAlterViewAsCommand(catalog: String, namespace: Seq[String],
                                   viewName: String, queryText: String)
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val vc = session.sessionState.catalogManager.catalog(catalog)
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(namespace.toArray, viewName)
    if (!vc.viewExists(ident)) throw new NoSuchViewException(ident)
    // analyze (not execute) the new defining query BEFORE any catalog
    // touch — a failed redefinition leaves the existing view intact
    val analyzed = session.sql(queryText)
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(
      ident, queryText, cm.currentCatalog.name(), cm.currentNamespace,
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]())
    vc.replaceView(info, false)
    Seq.empty
  }
}
