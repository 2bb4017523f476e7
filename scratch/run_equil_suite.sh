#!/bin/sh
cd /root/repo
echo "=== precond B=64 (failing TPU config) ==="
timeout 14000 python scratch/equil_cpu.py precond 64 20
echo "=== plain B=16 control ==="
timeout 4000 python scratch/equil_cpu.py plain 16 20
echo "=== precond B=16 ==="
timeout 4000 python scratch/equil_cpu.py precond 16 20
echo "=== SUITE DONE ==="
