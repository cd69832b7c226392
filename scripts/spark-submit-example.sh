#!/usr/bin/env bash
# How this library launches on a REAL multi-executor cluster (the north
# rule's spark-submit path). This sandbox has no cluster manager, but it
# ships /opt/spark/bin/spark-submit: scripts/spark_submit_scaling.sh runs
# THIS entrypoint through the real launcher at --master local[2] vs
# local[8] (separate JVM per run, same jar/class/args as below) and
# measures the N vs 4N efficiency criterion on the reported job seconds;
# graft.Bench holds the in-process min-of-rounds protocol (BASELINE.md
# has both). Nothing in graft.* assumes local mode.
#
#   sbt package                        # -> target/scala-2.13/*.jar
#
# Extraction pipeline over an interleaved-documents table, N executors:
set -euo pipefail
JAR=target/scala-2.13/intelligientpdfparserspark_2.13-0.1.0.jar
N=${N:-100}

spark-submit \
  --master yarn --deploy-mode cluster \
  --class graft.ExtractMain \
  --num-executors "$N" \
  --executor-cores 4 \
  --executor-memory 16g \
  --conf spark.sql.shuffle.partitions=$((N * 8)) \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.files.maxPartitionBytes=256m \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.plans.GraftExtensions \
  --conf spark.task.reaper.enabled=true \
  --conf spark.task.reaper.killTimeout=300s \
  "$JAR" \
  s3://bucket/docs-table/ s3://bucket/out/ 64   # saltPages; resumable — rerun after any failure

# The scaling criterion (efficiency >= 0.8 between N and 4N executors):
# run the same job twice with N and 4N, same input, and compare
#   t_N / (4 * t_4N)
# graft.Bench implements exactly this protocol in-process (interleaved
# min-of-rounds + paired-median estimators); on a cluster, substitute
# the two spark-submit wall clocks.

# Table maintenance on the committed output (same jar, same class):
#   compaction cadence bounds file counts AND the merge-on-read union
#   depth; delete is the takedown path (tombstones, no rewrite);
#   vacuum reclaims files/delete-sets no live snapshot references.
#
#   spark-submit --class graft.ExtractMain ... "$JAR" maintain s3://bucket/out/ compact 800
#   spark-submit --class graft.ExtractMain ... "$JAR" maintain s3://bucket/out/ delete doc123,doc456
#   spark-submit --class graft.ExtractMain ... "$JAR" maintain s3://bucket/out/ vacuum
#   spark-submit --class graft.ExtractMain ... "$JAR" maintain s3://bucket/out/ snapshots
