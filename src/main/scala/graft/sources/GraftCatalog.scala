package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.EncodePipeline

/** A TableCatalog exposing a directory tree of graft tables to plain SQL —
  * the Iceberg-catalog usage shape:
  *
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /warehouse
  *
  * `SELECT ... FROM graft.db.t` then resolves `/warehouse/db/t` as a graft
  * table (its identity is the persisted schema.json) and the connector's
  * whole skip stack applies — column pruning, zone-map part pruning,
  * manifest-served aggregates, reported statistics. A table IS its
  * directory: SHOW TABLES lists child directories carrying a schema.json,
  * DROP TABLE removes the directory, namespaces are directories. Tables
  * are created by writing (`df.write.format("graft").save(dir)` or the
  * pipeline API) — SQL CREATE TABLE has nothing to materialize for an
  * encode-on-write format, so it is unsupported by design. */
object GraftCatalog {
  /** the metadata views resolvable as `db.t.<name>` identifiers */
  private[sources] val metaTableNames = Set("snapshots", "files", "manifest")
}

class GraftCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog
    with ProcedureCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"spark.sql.catalog.$name.root must point at the warehouse directory")
    root = root.stripSuffix("/")
  }
  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs(p: Path) = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dirOf(ident: Identifier): String =
    (root +: (ident.namespace() :+ ident.name())).mkString("/")
  private def isTableDir(p: Path): Boolean = fs(p).exists(new Path(p, "schema.json"))

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    EncodePipeline.readSchemaFile(spark, dir) match {
      case Some(schema) => new GraftTable(dir, schema)
      case None =>
        // Iceberg's metadata-table identifiers: `db.t.snapshots` / `.files`
        // / `.manifest` resolve when `db.t` is a table and the extra name
        // part names a metadata view — plain SQL over the commit history
        if (ident.namespace().nonEmpty &&
            GraftCatalog.metaTableNames.contains(ident.name())) {
          val parent = (root +: ident.namespace().toSeq).mkString("/")
          if (isTableDir(new Path(parent)))
            return new GraftMetaTable(parent, ident.name(),
              GraftMetaTable.schemaOf(ident.name(), parent))
        }
        // Iceberg changelog-table parity: `db.t.changes` reads the table's
        // full PER-COMMIT change history (each generation diffed against
        // its predecessor; the base snapshot appears as gen-0 inserts)
        // with _change_type and _change_gen appended — plain SQL over the
        // CDC feed; windowed NET reads stay on
        // option("changesFrom"/"changesTo")
        if (ident.namespace().nonEmpty && ident.name() == "changes") {
          val parent = (root +: ident.namespace().toSeq).mkString("/")
          if (isTableDir(new Path(parent))) {
            val base = EncodePipeline.readSchemaFile(spark, parent).get
            return new GraftChangelogTable(parent,
              base.add(StructField("_change_type", StringType, nullable = false))
                  .add(StructField("_change_gen", IntegerType, nullable = false)))
          }
        }
        throw new NoSuchTableException(ident)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(new Path(dirOf(ident)))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = new Path((root +: namespace).mkString("/"))
    if (!fs(ns).exists(ns)) throw new NoSuchNamespaceException(namespace)
    fs(ns).listStatus(ns).filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created by writing: df.write.format(\"graft\").save(<dir>) " +
      "or EncodePipeline.run — SQL CREATE TABLE has nothing to materialize")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "alter via the pipeline API (schema evolution is by-name on write)")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dirOf(ident))
    isTableDir(p) && fs(p).delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = new Path(dirOf(oldIdent))
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    val to = new Path(dirOf(newIdent))
    if (!fs(from).rename(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // ---- functions: the name-encoded placement functions ----
  // Catalyst resolves a scan's reported KeyGroupedPartitioning transform
  // (`graft_part_<kind>_<P>[_<S>](key)`) through here — the hook that turns
  // co-written graft tables into storage-partitioned (shuffle-free) joins.
  override def loadFunction(ident: Identifier): UnboundFunction =
    GraftPartFunction.fromName(ident.name())
      .filter(_ => ident.namespace().isEmpty)
      .getOrElse(throw new NoSuchFunctionException(ident))

  override def functionExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && GraftPartFunction.fromName(ident.name()).isDefined

  /** placement functions are name-parameterized (unenumerable); listing is
    * for discovery UIs only, so list none rather than a fake sample */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array.empty

  // ---- procedures: the maintenance lifecycle as CALL statements ----
  // `CALL <cat>.system.compact/vacuum/rollback/...` — see [[GraftProcedures]]
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(root, ident).getOrElse(throw new IllegalArgumentException(
      s"unknown procedure ${ident.namespace().mkString(".")}.${ident.name()} — " +
        s"graft procedures live in `system`: ${GraftProcedures.names.mkString(", ")}"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // ---- namespaces are directories ----
  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    if (!fs(r).exists(r)) Array.empty
    else fs(r).listStatus(r).filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val ns = new Path((root +: namespace).mkString("/"))
    if (!fs(ns).exists(ns)) throw new NoSuchNamespaceException(namespace)
    fs(ns).listStatus(ns).filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => namespace :+ s.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = new Path((root +: namespace).mkString("/"))
    fs(p).exists(p) && !isTableDir(p)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    val p = new Path((root +: namespace).mkString("/"))
    fs(p).mkdirs(p)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = new Path((root +: namespace).mkString("/"))
    if (!namespaceExists(namespace)) return false
    if (!cascade && fs(p).listStatus(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs(p).delete(p, true)
  }
}
