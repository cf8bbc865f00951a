#!/bin/sh
# Windowed depth along a path (reference: flatgfa-sh/windows.sh).
# Run from the repository root with flash-tpu/fgfa-tpu on PATH.
flash-tpu -O -c 'odgi depth -i tests/graphs/tiny.gfa -r alpha | bedtools makewindows -b /dev/stdin -w 4' > tiny.w4.bed
fgfa-tpu -I tests/graphs/tiny.gfa depth -b tiny.w4.bed
rm -f tiny.w4.bed
