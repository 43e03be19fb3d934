import sys, time
sys.path.insert(0, "/root/repo")
from connected_component_spark.session import get_spark
from connected_component_spark.queries.graph import copresence_edges
from pyspark.sql import functions as F

spark = get_spark(app_name="copart-probe")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
SF = "/root/testdata/sf0.1"
P = 32

def loop(linked, rounds=6, tag=""):
    n = linked.select("src").distinct().count()
    rank = linked.select("src").distinct().select(
        F.col("src").alias("node"), (F.lit(1.0)/F.lit(float(n))).alias("rank"))
    t0 = time.time()
    plan = None
    for i in range(rounds):
        contrib = (linked.join(rank, linked.src == rank.node)
                   .select("dst", (F.col("rank")/F.col("outdeg")).alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("mass"))
                   .select(F.col("dst").alias("node"),
                           (F.lit(0.15/n) + F.lit(0.85)*F.col("mass")).alias("rank")))
        rank = contrib.localCheckpoint(eager=True)
        # capture a warmed mid-loop round's executed plan (falls back
        # to the last round when rounds < 3 — advice r14)
        if i == 2 or (plan is None and i == rounds - 1):
            plan = contrib._jdf.queryExecution().executedPlan().toString()
    wall = time.time() - t0
    nex = plan.count("Exchange hashpartitioning")
    print(f"{tag}: wall={wall:.2f}s round-plan exchanges={nex}")
    # show whether the linked side reads through an Exchange
    for line in plan.splitlines():
        if "Exchange" in line or "InMemoryTableScan" in line or "Scan ExistingRDD" in line or "SortMergeJoin" in line:
            print("   ", line.strip()[:120])
    return wall

edges = copresence_edges(spark, SF)
und = edges.select("src","dst").union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
out = und.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
base = und.join(out, "src")

# A: HEAD shape — eager localCheckpoint, unknown partitioning
A = base.localCheckpoint(eager=True)
# B: repartition on join key + persist (retains outputPartitioning via InMemoryRelation)
B = base.repartition(P, "src").persist(); B.count()
# C: B + sortWithinPartitions (offer SMJ the sort too)
C = base.repartition(P, "src").sortWithinPartitions("src").persist(); C.count()

for tag, df in (("A localCkpt", A), ("B repart+persist", B), ("C repart+sort+persist", C),
                ("A2 localCkpt again", A), ("B2 repart+persist again", B)):
    loop(df, tag=tag)
spark.stop()
