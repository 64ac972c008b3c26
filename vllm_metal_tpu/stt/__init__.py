# SPDX-License-Identifier: Apache-2.0
"""Speech-to-text subsystem (Whisper-family).

TPU-native counterpart of the reference STT stack
(``/root/reference/vllm_metal/stt/``): host-side numpy audio frontend,
a functional JAX Whisper encoder-decoder, and a transcriber whose greedy
decode loop runs entirely on device as one ``lax.while_loop`` dispatch
(the reference round-trips to the host every token,
``stt/whisper/transcriber.py:221-228``).
"""

from .detection import is_stt_model

__all__ = ["is_stt_model"]
