package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedIdentifier, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.SnapshotCatalog

/** SQL view support for the snapshot catalog. Stock Spark 4 parses
  * `CREATE VIEW` / `DROP VIEW` but its `ResolveSessionCatalog` REFUSES
  * them for any non-session V2 catalog ("catalog does not support
  * views") and its analyzer never calls `ViewCatalog.loadView` on the
  * read side — the V2 view API exists with no built-in driver, so
  * every V2 store that ships views (Iceberg) ships exactly this pair
  * of extension hooks:
  *
  *  - [[SnapViewParser]] (injectParser): after delegate parsing,
  *    re-routes CreateView / DropView / AlterViewAs whose target
  *    identifier lands in a [[SnapshotCatalog]] into eager commands
  *    that call the catalog's `createView` / `dropView` /
  *    `replaceView` — the body is ANALYZED at create/alter time
  *    (schema captured, bad references refuse now, like Spark's own
  *    views); everything else passes through untouched;
  *  - [[ResolveSnapViews]] (injectResolutionRule): an
  *    `UnresolvedRelation` that names a stored view re-parses the
  *    stored SQL in place (under a subquery alias), QUALIFIES every
  *    unqualified table name in the body against the view's STORED
  *    definition-time catalog/namespace (so the body resolves where
  *    the AUTHOR meant, not where the reader happens to sit — the V2
  *    view-resolution contract; a reader's `USE` state or same-named
  *    temp view can no longer redirect the view), and the view then
  *    re-resolves against the CURRENT table state on every read,
  *    keeping every scan optimization — manifest file skipping
  *    included — because resolution bottoms out in the ordinary table
  *    path. A view read composes with time travel:
  *    `FROM v TIMESTAMP AS OF t` pins every snapshot-catalog base
  *    table in the body at its snapshot as of `t` (timestamps are
  *    table-independent, so this is a consistent as-of read);
  *    `VERSION AS OF n` pushes the same id to every base — meaningful
  *    when the bases version in lockstep (documented caveat). A base
  *    that carries its OWN `AS OF` inside the body keeps it.
  *
  * Contract notes, stated not hidden: CTE names shadow table names
  * body-wide during qualification (a conservative superset of SQL's
  * lexical scoping — a body that names a table identically to a
  * sibling CTE should qualify that table reference explicitly); view
  * bodies may not reference TEMP views (refused at create, like
  * Spark's own persistent views); a view cycle fails analysis at
  * Spark's fixed-point iteration limit rather than a bespoke cycle
  * message.
  */
object SnapViews {

  /** The (catalog, identifier) a multipart name resolves to, iff that
    * catalog is a [[SnapshotCatalog]].
    */
  private[plans] def snapCatalogOf(session: SparkSession,
      parts: Seq[String]): Option[(SnapshotCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    val (catName, rest) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (parts.head, parts.tail)
      else (cm.currentCatalog.name, parts)
    if (rest.isEmpty) None
    else try cm.catalog(catName) match {
      case sc: SnapshotCatalog =>
        // a BARE name (no namespace, no catalog) lives in the session's
        // current namespace — the same resolution Spark's own relation
        // lookup applies under USE cat.ns
        val ns =
          if (rest.length == 1 && parts.length == 1) cm.currentNamespace
          else rest.init.toArray
        Some((sc, Identifier.of(ns, rest.last)))
      case _ => None
    } catch { case _: Exception => None }
  }

  /** CTE names defined ANYWHERE in the body (case-insensitive) — the
    * relation names qualification must leave alone. Body-wide rather
    * than scope-exact: conservative, stated in the class doc.
    */
  private[plans] def cteNamesIn(plan: LogicalPlan): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    plan.foreach {
      case w: UnresolvedWith =>
        w.cteRelations.foreach { case (n, _, _) => out += n.toLowerCase }
      case _ => ()
    }
    plan.foreach(_.expressions.foreach(_.foreach {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        out ++= cteNamesIn(s.plan)
      case _ => ()
    }))
    out.toSet
  }

  /** Qualify `u` against the view's stored definition context: a
    * bare name gets the stored catalog + namespace; a multipart name
    * whose head is not a registered catalog gets the stored catalog
    * (it was a namespace path in the author's catalog); an explicit
    * catalog-qualified name and CTE references pass through.
    */
  private[plans] def qualify(session: SparkSession, view: View,
      u: UnresolvedRelation, cteNames: Set[String]): UnresolvedRelation = {
    val parts = u.multipartIdentifier
    val cm = session.sessionState.catalogManager
    if (parts.length == 1 && cteNames(parts.head.toLowerCase)) u
    else if (parts.length > 1 && cm.isCatalogRegistered(parts.head)) u
    else if (parts.length == 1)
      u.copy(multipartIdentifier =
        (view.currentCatalog +: view.currentNamespace.toSeq) :+ parts.head)
    else u.copy(multipartIdentifier = view.currentCatalog +: parts)
  }

  /** The view body parsed and definition-context-qualified — what a
    * read expands to (under a SubqueryAlias added by the caller).
    */
  private[plans] def expandedBody(session: SparkSession,
      view: View): LogicalPlan = {
    val parsed = session.sessionState.sqlParser.parsePlan(view.query)
    val ctes = cteNamesIn(parsed)
    val qualified = parsed.transformDownWithSubqueries {
      // RelationTimeTravel is a LEAF (its relation is a constructor
      // field, not a child) — without the explicit case, a body's own
      // `FROM t VERSION AS OF n` would dodge qualification and resolve
      // in the READER's context
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        RelationTimeTravel(qualify(session, view, u, ctes), ts, ver)
      case u: UnresolvedRelation => qualify(session, view, u, ctes)
    }
    // the analyzer's Substitution batch (CTE inlining) ran before this
    // resolution rule could inject the body — apply it here so a WITH
    // inside a view body resolves exactly like a top-level WITH
    org.apache.spark.sql.catalyst.analysis.CTESubstitution(qualified)
  }

  /** Push a view-level `AS OF` into every snapshot-catalog base
    * relation of the (already expanded) body that does not carry its
    * own; a nested VIEW reference wraps too and re-enters the
    * resolution rule, so the pin composes transitively. Non-snapshot
    * relations (a temp over parquet, another catalog) cannot time
    * travel and pass through — stated caveat.
    */
  private[plans] def pushTimeTravel(session: SparkSession,
      body: LogicalPlan, ts: Option[Expression],
      version: Option[String]): LogicalPlan =
    body.transformDownWithSubqueries {
      case u: UnresolvedRelation
          if snapCatalogOf(session, u.multipartIdentifier).isDefined =>
        RelationTimeTravel(u, ts, version)
    }

  /** Whether the parsed body references view `ident` of `cat` itself
    * (under the CURRENT session's resolution context — the author's,
    * at create/alter time). A self-referential stored body would
    * validate against the OLD definition at replace time and then make
    * every read expand forever (analyzer iteration limit), so
    * OR REPLACE / ALTER ... AS refuse it up front. Indirect cycles
    * (v -> w -> v) still surface at the fixed-point limit on read —
    * stated in the class doc.
    */
  private[plans] def referencesView(session: SparkSession,
      parsed: LogicalPlan, cat: SnapshotCatalog,
      ident: Identifier): Boolean = {
    val ctes = cteNamesIn(parsed)
    var hit = false
    def check(u: UnresolvedRelation): Unit = {
      val parts = u.multipartIdentifier
      if (!(parts.length == 1 && ctes(parts.head.toLowerCase)))
        snapCatalogOf(session, parts) match {
          case Some((c, i)) if (c eq cat) && i == ident => hit = true
          case _ => ()
        }
    }
    parsed.transformDownWithSubqueries {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, _, _) =>
        check(u); tt
      case u: UnresolvedRelation => check(u); u
    }
    hit
  }

  /** Single-part (non-CTE) relation names in a body that resolve to
    * session TEMP views — a persistent view may not capture them
    * (their lifetime is the session's; the read path must refuse or,
    * worse, silently resolve to a table later).
    */
  private[plans] def tempViewRefs(session: SparkSession,
      parsed: LogicalPlan): Seq[String] = {
    val ctes = cteNamesIn(parsed)
    val found = scala.collection.mutable.ListBuffer[String]()
    def check(u: UnresolvedRelation): Unit = {
      val parts = u.multipartIdentifier
      if (parts.length <= 2 &&
          !(parts.length == 1 && ctes(parts.head.toLowerCase)) &&
          session.sessionState.catalog.isTempView(parts))
        found += parts.mkString(".")
    }
    parsed.transformDownWithSubqueries {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, _, _) =>
        check(u); tt // leaf: the inner relation needs the explicit look
      case u: UnresolvedRelation => check(u); u
    }
    found.toSeq.distinct
  }
}

/** Eager `CREATE [OR REPLACE] VIEW [IF NOT EXISTS]` against a
  * [[SnapshotCatalog]]: analyze the body once (schema capture +
  * validation), persist the definition file.
  */
case class CreateSnapViewCommand(nameParts: Seq[String], sql: String,
    replace: Boolean, allowExisting: Boolean,
    properties: Map[String, String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = SnapViews.snapCatalogOf(session, nameParts)
      .getOrElse(throw new IllegalStateException(
        s"CreateSnapViewCommand on non-snapshot catalog: " +
          nameParts.mkString(".")))
    val exists = cat.viewExists(ident)
    if (exists && allowExisting) return Seq.empty // IF NOT EXISTS: no-op
    // validate the NEW body fully BEFORE touching any existing view:
    // a refused OR REPLACE must leave the old view standing (the same
    // no-drop-window contract as ALTER VIEW ... AS)
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    val temps = SnapViews.tempViewRefs(session, parsed)
    require(temps.isEmpty,
      s"graft-snap views: the body references TEMP view(s) " +
        s"${temps.mkString(", ")} — a persistent view outlives the " +
        "session; reference catalog tables/views instead")
    // a self-reference would validate against the OLD body now and
    // make every later read expand forever — refuse up front
    require(!(exists && SnapViews.referencesView(session, parsed, cat,
        ident)),
      s"graft-snap views: the replacement body of " +
        s"${nameParts.mkString(".")} references the view itself — " +
        "a stored self-reference would make every read unresolvable")
    val analyzed = session.sql(sql) // eager analysis — bad body refuses
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name,
      cm.currentNamespace, analyzed.schema,
      analyzed.schema.fieldNames, Array.empty, Array.empty,
      new java.util.HashMap[String, String](
        scala.jdk.CollectionConverters.MapHasAsJava(properties).asJava))
    if (exists && replace) cat.replaceView(info) // atomic in-place swap
    else cat.createView(info) // throws ViewAlreadyExists when !replace
    Seq.empty
  }
}

/** Eager `ALTER VIEW ... AS <query>` against a [[SnapshotCatalog]]:
  * analyze the new body, then replace the stored definition IN PLACE
  * (one atomic file swap — the view never stops existing mid-alter,
  * unlike drop-and-recreate). Stored user properties carry over; the
  * definition context is re-captured from the ALTERING session (the
  * same rule CREATE uses: the author of the text owns its context).
  */
case class AlterSnapViewAsCommand(nameParts: Seq[String],
    sql: String) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = SnapViews.snapCatalogOf(session, nameParts)
      .getOrElse(throw new IllegalStateException(
        s"AlterSnapViewAsCommand on non-snapshot catalog: " +
          nameParts.mkString(".")))
    val old = cat.loadView(ident) // NoSuchViewException if absent
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    val temps = SnapViews.tempViewRefs(session, parsed)
    require(temps.isEmpty,
      s"graft-snap views: the new body references TEMP view(s) " +
        s"${temps.mkString(", ")} — a persistent view outlives the " +
        "session; reference catalog tables/views instead")
    require(!SnapViews.referencesView(session, parsed, cat, ident),
      s"graft-snap views: the new body of ${nameParts.mkString(".")} " +
        "references the view itself — a stored self-reference would " +
        "make every read unresolvable")
    val analyzed = session.sql(sql)
    val cm = session.sessionState.catalogManager
    cat.replaceView(new ViewInfo(ident, sql, cm.currentCatalog.name,
      cm.currentNamespace, analyzed.schema,
      analyzed.schema.fieldNames, Array.empty, Array.empty,
      new java.util.HashMap[String, String](old.properties())))
    Seq.empty
  }
}

/** Eager `DROP VIEW [IF EXISTS]` against a [[SnapshotCatalog]]. */
case class DropSnapViewCommand(nameParts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = SnapViews.snapCatalogOf(session, nameParts)
      .getOrElse(throw new IllegalStateException(
        s"DropSnapViewCommand on non-snapshot catalog: " +
          nameParts.mkString(".")))
    val existed = cat.dropView(ident)
    if (!existed && !ifExists)
      throw new IllegalArgumentException(
        s"view ${nameParts.mkString(".")} does not exist")
    Seq.empty
  }
}

/** Eager `ALTER VIEW ... RENAME TO` against a [[SnapshotCatalog]]. */
case class RenameSnapViewCommand(nameParts: Seq[String],
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (cat, ident) = SnapViews.snapCatalogOf(session, nameParts)
      .getOrElse(throw new IllegalStateException(
        s"RenameSnapViewCommand on non-snapshot catalog: " +
          nameParts.mkString(".")))
    // RENAME TO takes a name WITHIN the catalog (Spark's contract)
    val to = Identifier.of(newName.init.toArray, newName.last)
    cat.renameView(ident, to)
    Seq.empty
  }
}

/** Parser hook: delegate everything, then re-route view DDL whose
  * identifier lands in a [[SnapshotCatalog]].
  */
class SnapViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols,
          _, _, props, originalText, _, allowExisting, replace, _)
          if SnapViews.snapCatalogOf(session, parts).isDefined =>
        require(userCols.isEmpty,
          "graft-snap views: a user column list is not supported — " +
            "alias the columns in the view body instead")
        CreateSnapViewCommand(parts,
          originalText.getOrElse(throw new IllegalArgumentException(
            "graft-snap views: CREATE VIEW requires the body's SQL " +
              "text (AS <query>)")),
          replace, allowExisting, props)
      case DropView(UnresolvedIdentifier(parts, _), ifExists)
          if SnapViews.snapCatalogOf(session, parts).isDefined =>
        DropSnapViewCommand(parts, ifExists)
      case AlterViewAs(uv: UnresolvedView, originalText, _)
          if SnapViews.snapCatalogOf(session, uv.multipartIdentifier)
            .exists { case (c, i) => c.viewExists(i) } =>
        AlterSnapViewAsCommand(uv.multipartIdentifier, originalText)
      case rt: org.apache.spark.sql.catalyst.plans.logical.RenameTable
          if rt.isView && (rt.child match {
            case tv: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
              SnapViews.snapCatalogOf(session, tv.multipartIdentifier)
                .exists { case (c, i) => c.viewExists(i) }
            case _ => false
          }) =>
        val parts = rt.child
          .asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView]
          .multipartIdentifier
        RenameSnapViewCommand(parts, rt.newName)
      case other => other
    }

  override def parseExpression(t: String) = delegate.parseExpression(t)
  override def parseTableIdentifier(t: String) =
    delegate.parseTableIdentifier(t)
  override def parseFunctionIdentifier(t: String) =
    delegate.parseFunctionIdentifier(t)
  override def parseMultipartIdentifier(t: String) =
    delegate.parseMultipartIdentifier(t)
  override def parseTableSchema(t: String) = delegate.parseTableSchema(t)
  override def parseDataType(t: String) = delegate.parseDataType(t)
  override def parseQuery(t: String) = delegate.parseQuery(t)
  override def parseRoutineParam(t: String) =
    delegate.parseRoutineParam(t)
}

/** Read-side resolution: a relation naming a stored snapshot-catalog
  * view expands to its (re-parsed, definition-context-qualified) body
  * under a subquery alias; the fixed-point analyzer then resolves the
  * body like any query, nested views included. A view under
  * `VERSION/TIMESTAMP AS OF` expands with the travel pushed to its
  * snapshot-catalog bases.
  */
case class ResolveSnapViews(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) =>
        SnapViews.snapCatalogOf(session, u.multipartIdentifier) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            val view = cat.loadView(ident)
            SubqueryAlias(ident.name, SnapViews.pushTimeTravel(session,
              SnapViews.expandedBody(session, view), ts, ver))
          case _ => tt
        }
      case u: UnresolvedRelation =>
        SnapViews.snapCatalogOf(session, u.multipartIdentifier) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            val view = cat.loadView(ident)
            SubqueryAlias(ident.name,
              SnapViews.expandedBody(session, view))
          case _ => u
        }
    }
}
