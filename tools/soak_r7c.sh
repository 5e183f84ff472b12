#!/bin/bash
# Round-7 vector-family third step: the 200k-vec truth pass (knnGraph's
# exact-distance join sorts ~123M vector-carrying pairs, ~70 GB spill)
# exceeds this box's disk, so the third decade for knn/semdedup runs at
# 100k vectors — a 5x population step, same log-log slope arithmetic.
cd /root/repo
sbt -batch "runMain graft.tools.GenSoakCorpus /tmp/graft_soak_sf5v 5000 1000 100000 entities" && \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.SoakCandidates --families=knn,semdedup /tmp/graft_soak_sf1e /tmp/graft_soak_sf5v"
echo "soak-c rc=$?"
