#!/bin/bash
# Scale-curve bench chain (r10): the heavy families at 1x (sf0.1),
# 3x and 10x (ScaleGen corpora), sequentially on an otherwise idle
# machine. Produces /tmp/scale_bench_{x1,x3,x10}.json.
set -u
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
QUERIES="q28_minhash_lsh,q75_minhash_lsh_append,q33_ngram_jaccard,q148_containment_pairs,q49_near_dup_clusters,q93_sem_dedup,q97_ivf_append,q152_mann_whitney,q154_spearman,q167_classifier_auc,q182_kcore,q61_corpus_pipeline,q102_substr_dedup"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"

run_one() {
  local tag="$1" dir="$2"
  echo "[scale_bench] $tag ($dir) starting $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="/tmp/scale_bench_$tag.json" \
  java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
    > "/tmp/scale_bench_$tag.log" 2>&1
  echo "[scale_bench] $tag exit $? $(date -u +%H:%M:%S)"
}

run_one x1 /root/testdata/sf0.1
run_one x3 /root/repo/scaledata/x3
run_one x10 /root/repo/scaledata/x10
echo "[scale_bench] chain done"
