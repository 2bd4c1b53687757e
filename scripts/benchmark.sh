#!/bin/sh
# Combined heart benchmark: LP + FT for one pretrain (reference scripts/benchmark.sh)
pretrain_model=$1
dim=$2
sh scripts/lp_eval.sh "$pretrain_model" "$dim"
sh scripts/ft_eval.sh "$pretrain_model" "$dim"
