"""Torch-mirror golden test for the EVAL memory path (VERDICT r2 item 3) —
the eval-only semantics the accuracy gate (val Dice) flows through but the
training-forward mirror (test_torch_parity_full.py) never exercises:

- r-stride non-cond slot sampling, forward AND reverse
  (/root/reference/sam2_video/model/modeling/sam2_base.py:565-595)
- closest-cond selection with the before/after/remaining order
  (sam2_base.py:555-561, sam2_utils.py:19-61)
- unselected-cond fallback into r-stride slots and pointer rows
  (sam2_base.py:592-595, 645-647)
- past-only pointer filtering with SIGNED tpos at eval
  (sam2_base.py:618-647)

The torch side is an independent re-implementation of the reference's
variable-length eval-mode ``_prepare_memory_conditioned_features`` driving
the torch memory-attention mirror; the jax side is the REAL
``VideoPredictor._assemble_memory`` (host slot selection) feeding the real
``fuse_memory``. Assertions are three-layered: (1) the discrete selection —
which frame landed in which slot/pointer row, validity, tpos values — must
match exactly; (2) the memory-attention output must match numerically (with
wiring-sensitive params amplified so layout errors are ~100x fp noise);
(3) in-test mutation asserts prove the output comparison would catch
tpos/pointer/stride wiring bugs, and garbage in invalid slots proves full
masking."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sam2_video_tpu.eval.predictor import (CondOutput, InferenceState,
                                           TrackedOutput, VideoPredictor)
from sam2_video_tpu.models import sam2 as sam2_mod
from sam2_video_tpu.models.sam2 import SAM2Config
from sam2_video_tpu.ops.position_encoding import sine_pe_2d
from tests.test_torch_parity import t, torch_linear
from tests.test_torch_parity_full import (sine_pe_1d_torch, to_torch_tree,
                                          torch_memory_attention)

IMG = 64
N_OBJ = 2


def _cfg(**kw):
    base = dict(backbone="tiny", image_size=IMG, compute_dtype="float32",
                use_activation_checkpoint=False, remat_mode="none",
                memory_temporal_stride_for_eval=2)
    base.update(kw)
    return SAM2Config(**base)


# ---------------------------------------------------------------------------
# torch mirror of the reference EVAL memory construction
# ---------------------------------------------------------------------------


def mirror_select_closest(frame_idx, cond, budget):
    """select_closest_cond_frames mirror (sam2_utils.py:19-61), preserving
    the reference's insertion order: before, after, then by |distance|."""
    if budget == -1 or len(cond) <= budget:
        return dict(cond), {}
    assert budget >= 2
    selected = {}
    before = max((u for u in cond if u < frame_idx), default=None)
    if before is not None:
        selected[before] = cond[before]
    after = min((u for u in cond if u >= frame_idx), default=None)
    if after is not None:
        selected[after] = cond[after]
    rem = sorted((u for u in cond if u not in selected),
                 key=lambda x: abs(x - frame_idx))[: budget - len(selected)]
    selected.update((u, cond[u]) for u in rem)
    unselected = {u: v for u, v in cond.items() if u not in selected}
    return selected, unselected


def mirror_eval_memory(tp, cfg, curr_np, curr_pos_np, mem_pos_grid_np,
                       frame_idx, num_frames, cond, bank, reverse):
    """Reference `_prepare_memory_conditioned_features` at eval
    (sam2_base.py:549-675, training=False): variable-length construction in
    the reference's own order. ``cond``/``bank``: dict frame -> (mem [O,HW,64],
    ptr [O,C]). Returns (output [O,HW,C], debug dict with the discrete
    selection)."""
    M = cfg.num_maskmem
    stride = max(cfg.memory_temporal_stride_for_eval, 1)
    O, HW, mem_dim = curr_np.shape[0], mem_pos_grid_np.shape[0], \
        mem_pos_grid_np.shape[1]
    C = cfg.d_model
    Fs = cfg.feat_size

    selected, unselected = mirror_select_closest(
        frame_idx, cond, cfg.max_cond_frames_in_attn)

    # --- spatial entries: selected conds (t_pos 0) + r-stride non-cond ---
    entries = [("cond", u) for u in selected]          # t_pos = 0
    slot_frames = []                                   # debug: per t_pos
    for t_pos in range(1, M):
        t_rel = M - t_pos
        if t_rel == 1:
            prev = frame_idx + 1 if reverse else frame_idx - 1
        else:
            if not reverse:
                prev = ((frame_idx - 2) // stride) * stride \
                    - (t_rel - 2) * stride
            else:
                prev = -(-(frame_idx + 2) // stride) * stride \
                    + (t_rel - 2) * stride
        if prev in bank:
            entries.append(("noncond", prev))
            slot_frames.append(prev)
        elif prev in unselected:
            entries.append(("unsel", prev))
            slot_frames.append(prev)
        else:
            slot_frames.append(None)   # incl. prev in selected: skipped

    to_mem, to_pos = [], []
    i_noncond = 0
    for kind, u in entries:
        mem = (cond[u][0] if kind in ("cond", "unsel") else bank[u][0])
        to_mem.append(t(mem))
        if kind == "cond":
            enc_idx = M - 1                       # t_pos=0 -> index M-1
        else:
            # the next surviving non-cond entry sits at the t_pos of its
            # slot; recover it from slot_frames (reference adds
            # maskmem_tpos_enc[M - t_pos - 1], sam2_base.py:608-610)
            while slot_frames[i_noncond] is None:
                i_noncond += 1
            t_pos = i_noncond + 1
            enc_idx = M - t_pos - 1
            i_noncond += 1
        to_pos.append(t(mem_pos_grid_np)[None]
                      + tp["maskmem_tpos_enc"][enc_idx].reshape(1, 1, -1))
    memory = torch.cat(to_mem, dim=1)
    mem_pos = torch.cat(to_pos, dim=1)
    num_spatial = len(entries) * HW

    # --- pointers: past-only selected conds, signed tpos, then t_diff ---
    max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
    sign = -1 if reverse else 1
    ptr_cond = {u: v for u, v in selected.items()
                if not cfg.only_obj_ptrs_in_the_past_for_eval
                or (u >= frame_idx if reverse else u <= frame_idx)}
    pos_and_ptrs = [((frame_idx - u) * sign
                     if cfg.use_signed_tpos_enc_to_obj_ptrs
                     else abs(frame_idx - u), t(v[1]))
                    for u, v in ptr_cond.items()]
    ptr_debug = [("cond", u) for u in ptr_cond]
    for t_diff in range(1, max_ptrs):
        u = frame_idx + t_diff if reverse else frame_idx - t_diff
        if u < 0 or u >= num_frames:
            break
        out = bank.get(u, unselected.get(u))
        if out is not None:
            pos_and_ptrs.append((t_diff, t(out[1])))
            ptr_debug.append(("prev", u))
    P = len(pos_and_ptrs)
    tpp = C // mem_dim
    if P:
        ptrs = torch.stack([x for _, x in pos_and_ptrs], dim=0)  # [P, O, C]
        pos_list = torch.tensor([float(x) for x, _ in pos_and_ptrs])
        obj_pos = sine_pe_1d_torch(pos_list / (max_ptrs - 1), C)
        obj_pos = torch_linear(tp["obj_ptr_tpos_proj"], obj_pos)
        ptr_tok = ptrs.reshape(P, O, tpp, mem_dim).permute(
            1, 0, 2, 3).reshape(O, P * tpp, mem_dim)
        ptr_pos = obj_pos.repeat_interleave(tpp, dim=0)[None]
        memory = torch.cat([memory, ptr_tok], dim=1)
        mem_pos = torch.cat([mem_pos.expand(O, -1, -1),
                             ptr_pos.expand(O, -1, -1)], dim=1)

    out = torch_memory_attention(
        tp["memory_attention"], t(curr_np), memory, t(curr_pos_np)[None],
        mem_pos, (Fs, Fs), num_spatial).detach().numpy()
    return out, {
        "selected": list(selected), "unselected": list(unselected),
        "slot_frames": slot_frames,
        "ptrs": ptr_debug,
        "ptr_tpos": [float(x) for x, _ in pos_and_ptrs],
    }


# ---------------------------------------------------------------------------
# fixtures / scenario driver
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def amp_params():
    cfg = _cfg()
    p = sam2_mod.init(jax.random.PRNGKey(5), cfg)
    p["maskmem_tpos_enc"] = p["maskmem_tpos_enc"] * 25.0
    p["obj_ptr_tpos_proj"]["weight"] = p["obj_ptr_tpos_proj"]["weight"] * 25.0
    return jax.tree.map(lambda x: np.asarray(x), p)


def _rand_frames(rng, frames, O, HW, mem_dim, C):
    return {u: (rng.standard_normal((O, HW, mem_dim)).astype(np.float32),
                rng.standard_normal((O, C)).astype(np.float32))
            for u in frames}


def _run_scenario(params, cfg, n_cond, cond_frames, bank_frames, frame_idx,
                  num_frames, reverse, rng):
    Fs = cfg.feat_size
    HW = Fs * Fs
    C, mem_dim = cfg.d_model, cfg.mem_dim
    cond = _rand_frames(rng, cond_frames, N_OBJ, HW, mem_dim, C)
    bank = _rand_frames(rng, bank_frames, N_OBJ, HW, mem_dim, C)
    curr = rng.standard_normal((N_OBJ, HW, C)).astype(np.float32)
    curr_pos = np.asarray(sine_pe_2d(Fs, Fs, C)).reshape(HW, C)
    mem_pos_grid = np.asarray(sine_pe_2d(Fs, Fs, mem_dim)).reshape(HW,
                                                                   mem_dim)

    pred = VideoPredictor(params, cfg, max_objects=N_OBJ,
                          max_cond_frames=n_cond)
    state = InferenceState(num_frames=num_frames, orig_hw=(IMG, IMG),
                           feats=None, prompts={}, obj_order=[])
    cond_outputs = {u: CondOutput(lowres=None, mem=jnp.asarray(m),
                                  ptr=jnp.asarray(p2), score=None)
                    for u, (m, p2) in cond.items()}
    mem_bank = {u: TrackedOutput(mem=jnp.asarray(m), ptr=jnp.asarray(p2),
                                 lowres=None, score=None)
                for u, (m, p2) in bank.items()}
    slots, sv, tpos, ptrs, pv, pt, tdm = pred._assemble_memory(
        state, mem_bank, cond_outputs, frame_idx, reverse)

    def fuse(slots_, tpos_, ptrs_, pt_):
        out = sam2_mod.fuse_memory(
            params, cfg, pred._layout, jnp.asarray(curr),
            jnp.asarray(curr_pos),
            jnp.stack([jnp.asarray(s, jnp.float32) for s in slots_]),
            sv, jnp.asarray(mem_pos_grid), jnp.asarray(tpos_),
            jnp.stack([jnp.asarray(r, jnp.float32) for r in ptrs_]),
            pv, jnp.asarray(pt_, jnp.float32), training=False,
            t_diff_max=tdm)
        return np.asarray(jax.device_get(out))

    got = fuse(slots, tpos, ptrs, pt)
    want, dbg = mirror_eval_memory(
        to_torch_tree(params), cfg, curr, curr_pos, mem_pos_grid, frame_idx,
        num_frames, cond, bank, reverse)
    return dict(got=got, want=want, dbg=dbg, slots=slots,
                sv=np.asarray(sv), tpos=np.asarray(tpos), ptrs=ptrs,
                pv=np.asarray(pv), pt=np.asarray(pt), tdm=tdm, cond=cond,
                bank=bank, fuse=fuse, n_cond=n_cond, cfg=cfg)


def _frame_of(arr, cond, bank):
    """Identify which source frame a slot/pointer device array holds."""
    a = np.asarray(arr)
    for u, (m, p2) in {**cond, **bank}.items():
        ref = m if a.shape == m.shape else p2
        if np.array_equal(a, ref):
            return u
    return None


def _assert_selection_matches(r):
    """Layer 1: the DISCRETE selection must match the mirror exactly."""
    dbg, cfg, n_cond = r["dbg"], r["cfg"], r["n_cond"]
    M = cfg.num_maskmem
    # cond slots: the selected frames, in selection order, then padding
    sel = dbg["selected"]
    for i in range(n_cond):
        if i < len(sel):
            assert r["sv"][i], f"cond slot {i} should be valid"
            assert _frame_of(r["slots"][i], r["cond"], r["bank"]) == sel[i]
            assert r["tpos"][i] == M - 1
        else:
            assert not r["sv"][i]
    # non-cond slots: one per t_pos, frame (or None) per the r-stride rule
    for t_pos in range(1, M):
        i = n_cond + t_pos - 1
        want_frame = dbg["slot_frames"][t_pos - 1]
        assert r["tpos"][i] == M - t_pos - 1
        if want_frame is None:
            assert not r["sv"][i], f"slot t_pos={t_pos} should be invalid"
        else:
            assert r["sv"][i], f"slot t_pos={t_pos} should be valid"
            assert _frame_of(r["slots"][i], r["cond"], r["bank"]) \
                == want_frame, f"slot t_pos={t_pos}"
    # pointer rows: same frames in the same order, same (signed) tpos
    n_ptr = len(dbg["ptrs"])
    assert int(r["pv"].sum()) == n_ptr
    for i, (_, u) in enumerate(dbg["ptrs"]):
        assert r["pv"][i]
        assert _frame_of(r["ptrs"][i], r["cond"], r["bank"]) == u, \
            f"pointer row {i}"
        assert r["pt"][i] == dbg["ptr_tpos"][i], f"pointer tpos {i}"


ATOL = 2e-3


@pytest.mark.parametrize("name,n_cond,cond_f,bank_f,fi,nf,rev,extra", [
    # r=2 stride sampling fwd; prev hits the selected cond -> skipped slot
    ("fwd_rstride", 1, [0], range(1, 9), 9, 16, False, {}),
    # closest-cond selection {4,12} + unselected-0 fallback into BOTH an
    # r-stride slot and a pointer row; future cond 12 excluded from pointers
    ("fwd_multicond", 2, [0, 4, 12], [5, 6, 7, 8], 9, 16, False, {}),
    # reverse: r-stride seeks forward, future pointers included with
    # signed tpos = (frame_idx - t) * -1
    ("rev_rstride", 1, [12], [8, 9, 10, 11], 7, 16, True, {}),
    # reverse multi-cond: cond 2 is behind the track direction -> pointer
    # excluded by the past-only rule's reverse form
    ("rev_multicond", 2, [2, 12], [8, 9, 10, 11], 7, 16, True, {}),
    # past-only disabled: the future cond-12 pointer IS included and its
    # signed tpos is NEGATIVE (9 - 12 = -3) — the only case where signed
    # and |.| tpos differ in forward tracking (sam2_base.py:630-636)
    ("fwd_future_ptrs", 2, [0, 12], [7, 8], 9, 16, False,
     {"only_obj_ptrs_in_the_past_for_eval": False}),
])
def test_eval_memory_matches_reference_mirror(amp_params, name, n_cond,
                                              cond_f, bank_f, fi, nf, rev,
                                              extra):
    cfg = _cfg(max_cond_frames_in_attn=(2 if n_cond > 1 else -1), **extra)
    rng = np.random.default_rng(hash(name) % 2**31)
    r = _run_scenario(amp_params, cfg, n_cond, list(cond_f), list(bank_f),
                      fi, nf, rev, rng)
    _assert_selection_matches(r)
    np.testing.assert_allclose(r["got"], r["want"], atol=ATOL,
                               err_msg=f"scenario {name}")


def test_eval_memory_mutations_scream(amp_params):
    """Layer 3: prove the numeric comparison is sensitive to the eval wiring
    (tpos indexing, pointer tpos, pointer order) and that invalid slots are
    fully masked."""
    cfg = _cfg(max_cond_frames_in_attn=2)
    rng = np.random.default_rng(123)
    r = _run_scenario(amp_params, cfg, 2, [0, 4, 12], [5, 6, 7, 8], 9, 16,
                      False, rng)
    got, fuse = r["got"], r["fuse"]
    np.testing.assert_allclose(got, r["want"], atol=ATOL)

    mut_tpos = np.asarray(r["tpos"]).copy()
    mut_tpos[r["n_cond"]:] = mut_tpos[r["n_cond"]:][::-1]
    d = np.abs(fuse(r["slots"], mut_tpos, r["ptrs"], r["pt"]) - got).max()
    assert d > 10 * ATOL, f"tpos mutation only moved output by {d}"

    valid_rows = int(np.asarray(r["pv"]).sum())
    mut_pt = np.asarray(r["pt"]).copy()
    mut_pt[:valid_rows] = mut_pt[:valid_rows][::-1]
    d = np.abs(fuse(r["slots"], r["tpos"], r["ptrs"], mut_pt) - got).max()
    assert d > 10 * ATOL, f"ptr-tpos mutation only moved output by {d}"

    mut_ptrs = list(r["ptrs"])
    mut_ptrs[0], mut_ptrs[valid_rows - 1] = \
        mut_ptrs[valid_rows - 1], mut_ptrs[0]
    d = np.abs(fuse(r["slots"], r["tpos"], tuple(mut_ptrs), r["pt"])
               - got).max()
    assert d > 10 * ATOL, f"ptr-order mutation only moved output by {d}"

    garb = [np.asarray(s).copy() for s in r["slots"]]
    for i, v in enumerate(np.asarray(r["sv"])):
        if not v:
            garb[i][:] = 1e3
    np.testing.assert_allclose(fuse(tuple(garb), r["tpos"], r["ptrs"],
                                    r["pt"]), got, atol=1e-4,
                               err_msg="invalid eval slots leak")
