"""A functional stub Iceberg catalog: pure-Python emulation of exactly
the catalog surface ccspark.catalog.IcebergCheckpoint drives, with
snapshot history (every commit keeps the previous table state, so tests
can assert time-travel semantics).

The sandbox has no Iceberg jars and no network to fetch them
(`find / -name '*iceberg*.jar'` is empty; no ~/.m2 / ~/.ivy2 caches),
so the real backend cannot execute here.  This stub makes the SEMANTICS
executable: the whole crawl-frontier loop runs against
IcebergCheckpoint with the stub routing

* ``df.writeTo(t).partitionedBy(...).create() / .overwrite(cond) /
  .append()`` — snapshot-commit table mutations (overwrite evaluates
  the real Column predicate through Spark, not a re-implementation);
* ``spark.sql``: CREATE NAMESPACE, INSERT OVERWRITE ... PARTITION,
  DELETE FROM ... WHERE, SHOW TABLES IN — the three statement shapes
  the backend generates;
* ``spark.read.table`` / ``spark.catalog.tableExists``.

Tables are stored as pyarrow Tables (exact physical types — the int32
vs long parity the filters table depends on survives the round-trip).
"""

from __future__ import annotations

import re

import pyarrow as pa


class StubTable:
    def __init__(self, partitioning):
        self.partitioning = list(partitioning)
        self.snapshots: list[pa.Table] = []  # full table state per commit

    @property
    def current(self) -> pa.Table:
        return self.snapshots[-1]

    def commit(self, table: pa.Table) -> None:
        self.snapshots.append(table)


class StubCatalog:
    """name (without catalog prefix is fine) → StubTable"""

    def __init__(self, catalog: str):
        self.catalog = catalog
        self.namespaces: set[str] = set()
        self.tables: dict[str, StubTable] = {}

    def owns(self, identifier: str) -> bool:
        return identifier.startswith(self.catalog + ".")


def _col_name(col) -> str:
    m = re.search(r"Column<'(.+?)'>", str(col))
    return m.group(1) if m else str(col)


class _StubWriterV2:
    def __init__(self, spark, cat: StubCatalog, df, table: str):
        self.spark, self.cat, self.df, self.table = spark, cat, df, table
        self._partitioning = []

    def partitionedBy(self, *cols):
        self._partitioning = [_col_name(c) for c in cols]
        return self

    def create(self):
        if self.table in self.cat.tables:
            raise RuntimeError(f"table {self.table} already exists")
        t = StubTable(self._partitioning)
        t.commit(self.df.toArrow())
        self.cat.tables[self.table] = t

    def overwrite(self, condition):
        st = self.cat.tables[self.table]
        kept = self._materialize(st.current).where(~condition).toArrow()
        new = self.df.toArrow()
        st.commit(pa.concat_tables([kept, new.cast(kept.schema)]))

    def append(self):
        st = self.cat.tables[self.table]
        st.commit(pa.concat_tables([st.current, self.df.toArrow().cast(st.current.schema)]))

    def _materialize(self, arrow: pa.Table):
        return self.spark.createDataFrame(arrow)


_SQL_NS = re.compile(r"CREATE NAMESPACE IF NOT EXISTS (\S+)")
_SQL_SHOW = re.compile(r"SHOW TABLES IN (\S+)")
_SQL_DELETE = re.compile(r"DELETE FROM (\S+) WHERE _ckpt_round > (\d+)")
_SQL_COPY = re.compile(
    r"INSERT OVERWRITE (\S+) PARTITION \(_ckpt_round = (\d+)\) "
    r"SELECT \* EXCEPT \(_ckpt_round\) FROM (\S+) WHERE _ckpt_round = (\d+)"
)


def install(monkeypatch, spark, catalog_name: str) -> StubCatalog:
    """Route the stub catalog's identifiers through monkeypatched
    pyspark entry points; anything else falls through to the real ones."""
    cat = StubCatalog(catalog_name)

    # patch the CONCRETE classes (pyspark 4's classic implementations
    # override the pyspark.sql base-class methods, so patching the base
    # would be invisible)
    DataFrame = type(spark.range(1))
    orig_writeTo = DataFrame.writeTo

    def writeTo(self, table):
        if cat.owns(table):
            return _StubWriterV2(spark, cat, self, table)
        return orig_writeTo(self, table)

    monkeypatch.setattr(DataFrame, "writeTo", writeTo)

    orig_sql = type(spark).sql

    def sql(self, query, *a, **kw):
        m = _SQL_NS.match(query)
        if m and cat.owns(m.group(1) + "."):
            cat.namespaces.add(m.group(1))
            return None
        m = _SQL_SHOW.match(query)
        if m and cat.owns(m.group(1) + "."):
            prefix = m.group(1) + "."
            names = [t[len(prefix):] for t in cat.tables if t.startswith(prefix)]
            return orig_sql(
                self,
                "SELECT * FROM VALUES "
                + (", ".join(f"('{n}')" for n in names) or "('')")
                + " AS t(tableName)"
                + ("" if names else " WHERE tableName <> ''"),
            )
        m = _SQL_DELETE.match(query)
        if m and cat.owns(m.group(1)):
            st = cat.tables[m.group(1)]
            cur = st.current
            keep = pa.compute.less_equal(cur.column("_ckpt_round"), int(m.group(2)))
            st.commit(cur.filter(keep))
            return None
        m = _SQL_COPY.match(query)
        if m and cat.owns(m.group(1)):
            st = cat.tables[m.group(1)]
            cur = st.current
            src = cur.filter(pa.compute.equal(cur.column("_ckpt_round"), int(m.group(4))))
            dst_round = int(m.group(2))
            idx = src.schema.get_field_index("_ckpt_round")
            src = src.set_column(
                idx,
                src.schema.field(idx),
                pa.array([dst_round] * len(src), type=src.schema.field(idx).type),
            )
            rest = cur.filter(
                pa.compute.not_equal(cur.column("_ckpt_round"), dst_round)
            )
            st.commit(pa.concat_tables([rest, src]))
            return None
        return orig_sql(self, query, *a, **kw)

    monkeypatch.setattr(type(spark), "sql", sql)

    DataFrameReader = type(spark.read)
    orig_table = DataFrameReader.table

    def table(self, name):
        if cat.owns(name):
            return spark.createDataFrame(cat.tables[name].current)
        return orig_table(self, name)

    monkeypatch.setattr(DataFrameReader, "table", table)

    orig_exists = type(spark.catalog).tableExists

    def tableExists(self, name, dbName=None):
        if cat.owns(name):
            return name in cat.tables
        return orig_exists(self, name, dbName)

    monkeypatch.setattr(type(spark.catalog), "tableExists", tableExists)

    # make the availability gate pass for the stub catalog
    import ccspark.catalog as C

    orig_avail = C.iceberg_available
    monkeypatch.setattr(
        C,
        "iceberg_available",
        lambda sp, c: True if c == catalog_name else orig_avail(sp, c),
    )
    return cat
