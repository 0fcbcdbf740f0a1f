#!/bin/bash
# Lake metadata tier probe at many-small-files scale (see LakeMetaProbe).
cd "$(dirname "$0")/.." && exec sbt -batch "runMain graft.LakeMetaProbe ${1:-3000}"
