#!/usr/bin/env flash-tpu
odgi depth -d -i tests/graphs/tiny.gfa
odgi depth -i tests/graphs/tiny.gfa
