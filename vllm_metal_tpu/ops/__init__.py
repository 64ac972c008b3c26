# SPDX-License-Identifier: Apache-2.0
"""Compute ops: Pallas TPU kernels with pure-jnp reference implementations.

Every kernel in this package has a jnp reference path used for CPU tests and
as a fallback; the Pallas path is selected on TPU.  This mirrors the
reference's split between Python codecs and Metal kernels
(``/root/reference/vllm_metal/attention/caches/turboquant.py`` vs
``turboquant.metal``) — but here both sides live in one module and are tested
against each other in interpret mode.
"""
