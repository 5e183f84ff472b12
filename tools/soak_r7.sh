#!/bin/bash
# Round-7 soak driver (dev tooling): regenerate the 10x soak corpus with
# the rare-entity long tail, add the 100x third-decade corpus, and
# measure candidate-growth exponents for the flagship families across
# sf0.01 -> sf0.1 -> syn-10x -> syn-100x.
cd /root/repo
sbt -batch "runMain graft.tools.GenSoakCorpus /tmp/graft_soak_sf1e 50000 200000 20000 entities" && \
sbt -batch "runMain graft.tools.GenSoakCorpus /tmp/graft_soak_sf10 500000 200000 200000 entities" && \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.SoakCandidates --families=minhash,simhash,containment,incremental,knn,semdedup,fuzzybest /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/graft_soak_sf1e /tmp/graft_soak_sf10"
echo "soak rc=$?"
