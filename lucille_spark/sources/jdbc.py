"""DatabaseConnector parity: JDBC source with preSQL/postSQL, fetch size,
partitioned reads, and the otherSQLs child-document merge
(reference: connector/jdbc/DatabaseConnector.java:52-431; the hand-rolled
sort-merge of child cursors at :289-338 becomes a Catalyst groupBy+join).

Spark-first mapping:
- sql                -> ``spark.read.format("jdbc").option("query", ...)``
  (predicate pushdown / column pruning reach the database; with
  partition_column + bounds the read is split across executors, the
  distributed analogue of the reference's single cursor)
- fetchSize          -> option("fetchsize")
- preSql / postSql   -> driver-side statements through the same JVM's
  java.sql.DriverManager (DatabaseConnector.java:139-160)
- otherSQLs + otherJoinFields -> each child query is read as a DataFrame,
  grouped per join key, and attached as an array<struct> column
  ``children`` (``children_2``, ... for multiple child queries) — the
  reference's runSql2 merge loop (:289-338)

Tested against Apache Derby embedded (ships with Spark's JVM classpath);
any JDBC URL works the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DatabaseConnector:
    def __init__(self, spark: SparkSession, connection_string: str,
                 sql: str, id_field: str = "id",
                 driver: Optional[str] = None,
                 user: Optional[str] = None,
                 password: Optional[str] = None,
                 pre_sql: Sequence[str] = (),
                 post_sql: Sequence[str] = (),
                 other_sqls: Sequence[str] = (),
                 other_join_fields: Sequence[str] = (),
                 fetch_size: int = 1000,
                 partition_column: Optional[str] = None,
                 lower_bound: Optional[int] = None,
                 upper_bound: Optional[int] = None,
                 num_partitions: Optional[int] = None,
                 doc_id_prefix: str = ""):
        if other_sqls and len(other_sqls) != len(other_join_fields):
            raise ValueError(
                "otherSQLs and otherJoinFields must pair up "
                "(DatabaseConnector.java:116-120)")
        self.spark = spark
        self.connection_string = connection_string
        self.sql = sql
        self.id_field = id_field
        self.driver = driver
        self.user = user
        self.password = password
        self.pre_sql = list(pre_sql)
        self.post_sql = list(post_sql)
        self.other_sqls = list(other_sqls)
        self.other_join_fields = list(other_join_fields)
        self.fetch_size = fetch_size
        self.partition_column = partition_column
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.num_partitions = num_partitions
        self.doc_id_prefix = doc_id_prefix

    # ------------------------------------------------ raw JDBC statements
    def execute(self, statements: Sequence[str]) -> None:
        """Driver-side DDL/DML through java.sql.DriverManager (the
        reference's createConnection + Statement.execute, :139-160)."""
        if not statements:
            return
        jvm = self.spark._jvm
        if self.driver:
            jvm.java.lang.Class.forName(self.driver)
        if self.user is not None:
            conn = jvm.java.sql.DriverManager.getConnection(
                self.connection_string, self.user, self.password or "")
        else:
            conn = jvm.java.sql.DriverManager.getConnection(
                self.connection_string)
        try:
            st = conn.createStatement()
            for s in statements:
                st.execute(s)
            st.close()
        finally:
            conn.close()

    # ----------------------------------------------------------- reading
    def _read_query(self, query: str, partitioned: bool) -> DataFrame:
        reader = (self.spark.read.format("jdbc")
                  .option("url", self.connection_string)
                  .option("fetchsize", str(self.fetch_size)))
        if self.driver:
            reader = reader.option("driver", self.driver)
        if self.user is not None:
            reader = reader.option("user", self.user) \
                .option("password", self.password or "")
        if partitioned and self.partition_column is not None:
            # Spark requires dbtable (not query) for partitioned reads;
            # the query becomes a derived table. No ORDER BY here — row
            # order is owned by the downstream plan, and the reference's
            # orderBy exists only for its cursor merge, which Catalyst's
            # join replaces.
            reader = (reader
                      .option("dbtable", f"({query}) src")
                      .option("partitionColumn", self.partition_column)
                      .option("lowerBound", str(self.lower_bound))
                      .option("upperBound", str(self.upper_bound))
                      .option("numPartitions",
                              str(self.num_partitions or 4)))
        else:
            reader = reader.option("query", query)
        return reader.load()

    def read(self) -> DataFrame:
        """Run preSql, then read the main query (partitioned when bounds
        are configured) and attach child rows per otherSQLs. Call
        :meth:`finish` after the downstream write to run postSql."""
        self.execute(self.pre_sql)
        df = self._read_query(self.sql, partitioned=True)
        if self.doc_id_prefix:
            df = df.withColumn(
                self.id_field,
                F.concat(F.lit(self.doc_id_prefix),
                         F.col(self.id_field).cast("string")))
        for i, (child_sql, join_field) in enumerate(
                zip(self.other_sqls, self.other_join_fields)):
            child = self._read_query(child_sql, partitioned=False)
            col_name = "children" if i == 0 else f"children_{i + 1}"
            rolled = (child
                      .withColumn("_c", F.struct(*[
                          F.col(c) for c in child.columns]))
                      .groupBy(join_field)
                      .agg(F.collect_list("_c").alias(col_name)))
            df = df.join(rolled,
                         df[self.id_field].cast("string")
                         == rolled[join_field].cast("string"),
                         "left").drop(rolled[join_field])
        return df

    def finish(self) -> None:
        self.execute(self.post_sql)
