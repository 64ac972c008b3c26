# SPDX-License-Identifier: Apache-2.0
"""Engine: continuous-batching scheduler, block manager, runner, sampling.

The reference delegates all of this to upstream vLLM (SURVEY.md §0); here it
is owned in-repo and designed TPU-first: static-shape bucketed batches,
on-device sampling, functional KV updates with buffer donation.
"""
