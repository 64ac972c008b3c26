# SPDX-License-Identifier: Apache-2.0
"""Multimodal (vision) subsystem tests.

Mirrors the reference's mm suites (``/root/reference/tests/multimodal/``,
``tests/v1/mm/``) at tier-1/2 scale: M-RoPE position math, processor
patchify contract, vision-tower shapes, embedding splice, encoder cache,
and engine-level paged-vs-dense golden parity with a tiny random VLM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metal_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                   SchedulerConfig)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.common import apply_mrope, apply_rope, \
    rope_frequencies
from vllm_metal_tpu.models.llama import LlamaModel, dense_causal_attn
from vllm_metal_tpu.models.qwen2_vl import Qwen2VLModel
from vllm_metal_tpu.multimodal import vision as V
from vllm_metal_tpu.multimodal.encoder_cache import EncoderCache
from vllm_metal_tpu.multimodal.mrope import MMFeature, mrope_positions
from vllm_metal_tpu.multimodal.processor import preprocess_image, \
    smart_resize


# ---------------------------------------------------------------------------
# M-RoPE positions
# ---------------------------------------------------------------------------

class TestMRope:
    def test_hand_example(self):
        # 2 text | image grid (1,4,4), merge 2 -> 4 tokens | 2 text
        feats = [MMFeature(offset=2, grid_thw=(1, 4, 4))]
        pos, delta = mrope_positions(8, feats, spatial_merge_size=2)
        # text
        assert pos[:, 0].tolist() == [0, 0, 0]
        assert pos[:, 1].tolist() == [1, 1, 1]
        # image: t constant, h row-major, w col-major (+st=2)
        assert pos[0, 2:6].tolist() == [2, 2, 2, 2]
        assert pos[1, 2:6].tolist() == [2, 2, 3, 3]
        assert pos[2, 2:6].tolist() == [2, 3, 2, 3]
        # trailing text resumes at st=2+max(1,2,2)=4
        assert pos[:, 6].tolist() == [4, 4, 4]
        assert pos[:, 7].tolist() == [5, 5, 5]
        assert delta == 6 - 8

    def test_text_only_linear(self):
        pos, delta = mrope_positions(5, [], 2)
        assert (pos == np.arange(5)[None]).all()
        assert delta == 0

    def test_wide_image_dominates_advance(self):
        # grid (1,2,8) merge 2 -> gh=1, gw=4 -> 4 tokens, advance max=4
        feats = [MMFeature(offset=0, grid_thw=(1, 2, 8))]
        pos, delta = mrope_positions(5, feats, 2)
        assert pos[2, :4].tolist() == [0, 1, 2, 3]
        assert pos[:, 4].tolist() == [4, 4, 4]
        assert delta == 5 - 5

    def test_overlap_rejected(self):
        feats = [MMFeature(offset=0, grid_thw=(1, 4, 4)),
                 MMFeature(offset=2, grid_thw=(1, 4, 4))]
        with pytest.raises(ValueError):
            mrope_positions(10, feats, 2)

    def test_apply_mrope_reduces_to_rope_on_equal_axes(self):
        inv = rope_frequencies(32, 10000.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (6, 2, 32))
        lin = jnp.arange(6, dtype=jnp.int32)
        a = apply_rope(x, lin, inv)
        b = apply_mrope(x, jnp.stack([lin] * 3), inv, (4, 6, 6))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6

    def test_apply_mrope_sections_select_axes(self):
        """Different h/w positions only affect their frequency sections."""
        inv = rope_frequencies(32, 10000.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 32))
        base = jnp.stack([jnp.zeros(4, jnp.int32)] * 3)
        p2 = base.at[2].set(jnp.arange(4, dtype=jnp.int32))  # w axis moves
        a = np.asarray(apply_mrope(x, base, inv, (4, 6, 6)))
        b = np.asarray(apply_mrope(x, p2, inv, (4, 6, 6)))
        # t/h sections (freqs 0..9 -> dims 0..9 and 16..25) unchanged
        assert np.abs(a[..., :10] - b[..., :10]).max() < 1e-6
        assert np.abs(a[..., 16:26] - b[..., 16:26]).max() < 1e-6
        # w section differs for nonzero positions
        assert np.abs(a[1:, :, 10:16] - b[1:, :, 10:16]).max() > 1e-3


# ---------------------------------------------------------------------------
# Processor + vision tower
# ---------------------------------------------------------------------------

TINY_V = V.VisionConfig(depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0,
                        patch_size=4, temporal_patch_size=1,
                        spatial_merge_size=2, in_channels=3,
                        hidden_size=48, hidden_act="quick_gelu")


class TestProcessorAndTower:
    def test_smart_resize_bounds(self):
        h, w = smart_resize(100, 200, 8, min_pixels=64, max_pixels=16384)
        assert h % 8 == 0 and w % 8 == 0
        assert 64 <= h * w <= 16384

    def test_patchify_positions_contract(self):
        """Patch k's pixels come from grid cell patch_positions[k]."""
        ps, m = TINY_V.patch_size, TINY_V.spatial_merge_size
        gh, gw = 4, 6
        img = np.zeros((gh * ps, gw * ps, 3), np.float32)
        # encode grid coords into pixel values
        for r in range(gh):
            for c in range(gw):
                img[r * ps:(r + 1) * ps, c * ps:(c + 1) * ps] = r * 100 + c
        patches, grid = preprocess_image(
            img, TINY_V, min_pixels=1, max_pixels=10 ** 9)
        assert grid == (1, gh, gw)
        pos = V.patch_positions(grid, m)
        assert patches.shape[0] == gh * gw == pos.shape[0]
        from vllm_metal_tpu.multimodal.processor import (OPENAI_CLIP_MEAN,
                                                         OPENAI_CLIP_STD)
        for k in range(patches.shape[0]):
            # undo normalization on channel 0 and read the coded value
            val = patches[k].reshape(3, -1)[0].mean() \
                * OPENAI_CLIP_STD[0] + OPENAI_CLIP_MEAN[0]
            r, c = pos[k]
            assert abs(val - (r * 100 + c)) < 1e-3, (k, r, c, val)

    def test_tower_shapes_and_finite(self):
        w = V.init_random(TINY_V, jax.random.PRNGKey(0))
        grid = (1, 4, 6)
        n = 4 * 6
        patches = np.random.default_rng(0).standard_normal(
            (n, TINY_V.patch_dim)).astype(np.float32)
        pos = V.patch_positions(grid, TINY_V.spatial_merge_size)
        out = V.vision_forward(TINY_V, w, jnp.asarray(patches),
                               jnp.asarray(pos))
        assert out.shape == (n // 4, TINY_V.hidden_size)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_splice_mm(self):
        x = jnp.zeros((6, 4))
        emb = jnp.ones((4, 4)) * jnp.arange(1, 5)[:, None]
        rows = jnp.asarray([1, 3, -1, -1], jnp.int32)
        out = np.asarray(LlamaModel.splice_mm(x, emb, rows))
        assert (out[1] == 1).all() and (out[3] == 2).all()
        assert (out[0] == 0).all() and (out[5] == 0).all()

    def test_encoder_cache(self):
        cache = EncoderCache(max_entries=2)
        calls = []
        cache.get_or_encode("a", lambda: calls.append("a") or 1)
        cache.get_or_encode("a", lambda: calls.append("a2") or 2)
        assert calls == ["a"] and cache.hits == 1 and cache.misses == 1
        cache.get_or_encode("b", lambda: 2)
        cache.get_or_encode("c", lambda: 3)  # evicts "a"
        cache.get_or_encode("a", lambda: calls.append("a3") or 4)
        assert "a3" in calls


# ---------------------------------------------------------------------------
# Engine e2e: paged VLM vs dense reference
# ---------------------------------------------------------------------------

IMG_TOK = 120

VL_CFG = ModelConfig(
    vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
    architecture="qwen2_vl",
    extra={"mrope_section": [2, 3, 3], "image_token_id": IMG_TOK,
           "vision_cfg": TINY_V},
)


def _vl_engine(seed=0, budget=64, **sched_kw):
    cfg = EngineConfig(
        model=VL_CFG,
        cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=budget,
            token_buckets=(16, 32, 64), **sched_kw),
    )
    model = Qwen2VLModel(VL_CFG)
    model.set_vision(TINY_V, V.init_random(TINY_V, jax.random.PRNGKey(7)))
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    return eng, model, weights


def _image_feature(seed=1):
    ps = TINY_V.patch_size
    rng = np.random.default_rng(seed)
    img = rng.random((2 * ps * 2, 3 * ps * 2, 3), np.float32)  # grid 4x6
    patches, grid = preprocess_image(img, TINY_V, min_pixels=1,
                                     max_pixels=10 ** 9)
    return MMFeature(offset=-1, grid_thw=grid, pixel_patches=patches)


def _dense_greedy(model, weights, prompt, feats, merge, steps):
    """Dense-attention greedy decode reference with mrope + splice."""
    ids = list(prompt)
    out = []
    embeds = [np.asarray(f.embeds, np.float32) for f in feats]
    rows = []
    for f in feats:
        rows.extend(range(f.offset, f.offset + f.embeds.shape[0]))
    mm = jnp.asarray(np.concatenate(embeds, 0)) if rows else None
    mm_rows = jnp.asarray(rows, jnp.int32) if rows else None
    for _ in range(steps):
        pos, delta = mrope_positions(len(ids), feats, merge)
        hidden = model.forward_hidden(
            weights, jnp.asarray(ids, jnp.int32), jnp.asarray(pos),
            dense_causal_attn(model.cfg), mm_embeds=mm, mm_rows=mm_rows)
        logits = model.logits(weights, hidden[-1:])
        nxt = int(np.argmax(np.asarray(logits[0])))
        out.append(nxt)
        ids.append(nxt)
    return out


class TestEngineVLM:
    def _prompt(self, n_img_tokens):
        return [3, 7] + [IMG_TOK] * n_img_tokens + [9, 11, 5]

    def test_paged_matches_dense_reference(self):
        eng, model, weights = _vl_engine()
        feat = _image_feature()
        n = feat.num_tokens(TINY_V.spatial_merge_size)
        prompt = self._prompt(n)
        sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
        rid = eng.add_request(prompt, sp, mm_features=[feat])
        outs = {}
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o
        got = outs[rid].token_ids
        # feature now has offset + embeds filled by admission
        want = _dense_greedy(model, weights, prompt, [feat],
                             TINY_V.spatial_merge_size, 6)
        assert got == want

    def test_chunked_prefill_matches_unchunked(self):
        """Image placeholders split across prefill chunks still splice."""
        feat = _image_feature(seed=2)
        n = feat.num_tokens(TINY_V.spatial_merge_size)
        prompt = self._prompt(n)
        sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)

        def run(budget):
            import dataclasses
            feat2 = dataclasses.replace(feat, offset=-1, embeds=None)
            eng, _, _ = _vl_engine(budget=budget)
            rid = eng.add_request(prompt, sp, mm_features=[feat2])
            outs = {}
            while eng.has_unfinished():
                for o in eng.step():
                    if o.finished:
                        outs[o.request_id] = o
            return outs[rid].token_ids

        assert run(64) == run(16)

    def test_text_only_on_vl_model(self):
        eng, _, _ = _vl_engine()
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        outs = eng.generate([[4, 8, 15, 16, 23]], sp)
        (o,) = outs.values()
        assert len(o.token_ids) == 4

    def test_encoder_cache_dedup(self):
        import dataclasses
        eng, _, _ = _vl_engine()
        feat = _image_feature(seed=3)
        n = feat.num_tokens(TINY_V.spatial_merge_size)
        sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
        f1 = dataclasses.replace(feat)
        f2 = dataclasses.replace(feat)
        eng.generate([self._prompt(n)], sp)  # no image: text-only pass
        r1 = eng.add_request(self._prompt(n), sp, mm_features=[f1])
        r2 = eng.add_request(self._prompt(n), sp, mm_features=[f2])
        while eng.has_unfinished():
            eng.step()
        assert eng.encoder_cache.misses == 1
        assert eng.encoder_cache.hits == 1
        del r1, r2

    def test_mismatched_embed_count_rejected(self):
        eng, _, _ = _vl_engine()
        feat = _image_feature(seed=4)
        # placeholder run shorter than the grid demands
        prompt = [3] + [IMG_TOK] * 2 + [9]
        with pytest.raises(ValueError):
            eng.add_request(prompt, SamplingParams(max_tokens=2),
                            mm_features=[feat])
