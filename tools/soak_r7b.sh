#!/bin/bash
# Round-7 third-decade soak, chunked: each family group runs in its own
# JVM so shuffle dirs are reclaimed between groups (the single-JVM run
# accumulated spills past the disk budget).
cd /root/repo
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.SoakCandidates --families=minhash,simhash,containment,incremental,fuzzybest /tmp/graft_soak_sf1e /tmp/graft_soak_sf10" && \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.SoakCandidates --families=knn /tmp/graft_soak_sf1e /tmp/graft_soak_sf10" && \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.SoakCandidates --families=semdedup /tmp/graft_soak_sf1e /tmp/graft_soak_sf10"
echo "soak-b rc=$?"
