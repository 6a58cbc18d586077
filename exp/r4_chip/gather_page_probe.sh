#!/bin/bash
# Raw gather ceiling vs descriptor (page) size — VERDICT r3 #2.
cd /root/repo
for pg in 8 16 32 64; do
  timeout 600 python exp/dma_probe.py gather 1024 3 64 1 $pg
done
# contig reference ceiling at the same chunk/ring
timeout 600 python exp/dma_probe.py contig 1024 3 64 1 8
