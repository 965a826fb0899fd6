"""nnet3 graph -> batched JAX forward function.

Replaces Kaldi's nnet3 computation VM (nnet-compile.cc / nnet-compute.cc /
decodable-simple-looped.cc:66-180, ~68k LoC of graph compiler + interpreter)
with a direct compilation: the node graph of a parsed ``Nnet3Spec`` is
planned once per (num_output_frames, subsampling) into static time ranges
per node, then evaluated as a chain of batched jnp ops over
``[streams, frames, dim]`` arrays. XLA sees one straight-line program of
matmuls + elementwise ops — no interpreter, no per-frame dispatch; the MXU
gets [B*T, D] matmuls.

Time indexing: every node value is an array covering times
``[lo, hi)`` (frame indices relative to the *output* frame clock, before
subsampling). The input node's planned range defines the model's left/right
context, exactly like Kaldi's nnet3 context computation.

Descriptor semantics follow kaldi/src/nnet3/nnet-descriptor.h: Append, Sum,
Offset, Scale, Const, ReplaceIndex, Round, IfDefined, Failover, Switch.
Component semantics follow the corresponding Component::Propagate
implementations (nnet-simple-component.cc, nnet-normalize-component.cc,
nnet-tdnn-component.cc).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..io.nnet3_file import ComponentSpec, Descriptor, Nnet3Spec, NodeSpec

# ---------------------------------------------------------------------------
# Planning: per-node time ranges
# ---------------------------------------------------------------------------


def _accumulate(acc: Dict[str, Tuple[int, int]], name: str, lo: int, hi: int) -> None:
    if hi <= lo:
        return
    cur = acc.get(name)
    if cur is None:
        acc[name] = (lo, hi)
    else:
        acc[name] = (min(cur[0], lo), max(cur[1], hi))


def _desc_ranges(
    desc: Descriptor, lo: int, hi: int, acc: Dict[str, Tuple[int, int]]
) -> None:
    kind = desc[0]
    if kind == "node":
        _accumulate(acc, desc[1], lo, hi)
    elif kind == "offset":
        _desc_ranges(desc[1], lo + desc[2], hi + desc[2], acc)
    elif kind in ("append", "sum", "switch"):
        for sub in desc[1]:
            _desc_ranges(sub, lo, hi, acc)
    elif kind == "scale":
        _desc_ranges(desc[2], lo, hi, acc)
    elif kind == "const":
        pass
    elif kind == "replace_index":
        _desc_ranges(desc[1], desc[3], desc[3] + 1, acc)
    elif kind == "round":
        m = desc[2]
        new_lo = (lo // m) * m
        new_hi = ((hi - 1) // m) * m + 1
        _desc_ranges(desc[1], new_lo, new_hi, acc)
    elif kind == "ifdefined":
        # IfDefined doesn't *require* its argument; but for static shapes we
        # compute it over the clamped intersection at eval time. Request the
        # full range so recurrent paths (when in range) are available.
        _desc_ranges(desc[1], lo, hi, acc)
    elif kind == "failover":
        _desc_ranges(desc[1], lo, hi, acc)
        _desc_ranges(desc[2], lo, hi, acc)
    else:
        raise ValueError(f"unknown descriptor kind {kind}")


def _collect_node_refs(desc: Descriptor, out: set) -> None:
    kind = desc[0]
    if kind == "node":
        out.add(desc[1])
    elif kind in ("append", "sum", "switch"):
        for sub in desc[1]:
            _collect_node_refs(sub, out)
    elif kind in ("offset", "ifdefined"):
        _collect_node_refs(desc[1], out)
    elif kind == "scale":
        _collect_node_refs(desc[2], out)
    elif kind in ("replace_index", "round"):
        _collect_node_refs(desc[1], out)
    elif kind == "failover":
        _collect_node_refs(desc[1], out)
        _collect_node_refs(desc[2], out)


def _component_time_offsets(comp: ComponentSpec) -> List[int]:
    if comp.type == "TdnnComponent":
        return [int(x) for x in comp.attrs["TimeOffsets"]]
    return [0]


# ---------------------------------------------------------------------------
# Dim inference for descriptors
# ---------------------------------------------------------------------------


def _desc_dim(desc: Descriptor, node_dims: Dict[str, int]) -> int:
    kind = desc[0]
    if kind == "node":
        return node_dims[desc[1]]
    if kind == "offset":
        return _desc_dim(desc[1], node_dims)
    if kind == "append":
        return sum(_desc_dim(s, node_dims) for s in desc[1])
    if kind in ("sum", "switch"):
        return _desc_dim(desc[1][0], node_dims)
    if kind == "scale":
        return _desc_dim(desc[2], node_dims)
    if kind == "const":
        return desc[2]
    if kind == "replace_index":
        return _desc_dim(desc[1], node_dims)
    if kind == "round":
        return _desc_dim(desc[1], node_dims)
    if kind in ("ifdefined",):
        return _desc_dim(desc[1], node_dims)
    if kind == "failover":
        return _desc_dim(desc[1], node_dims)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Component forward
# ---------------------------------------------------------------------------


def _extract_params(comp: ComponentSpec) -> Dict[str, np.ndarray]:
    """Inference-relevant parameters of a component, as numpy arrays."""
    t, a = comp.type, comp.attrs
    if t in ("AffineComponent", "NaturalGradientAffineComponent",
             "FixedAffineComponent"):
        return {"w": a["LinearParams"].T.copy(), "b": a["BiasParams"]}
    if t == "LinearComponent":
        return {"w": a["Params"].T.copy()}
    if t == "TdnnComponent":
        out = {"w": a["LinearParams"].T.copy()}
        if a.get("BiasParams") is not None and a["BiasParams"].shape[0]:
            out["b"] = a["BiasParams"]
        return out
    if t == "BatchNormComponent":
        eps = a.get("Epsilon", 1.0e-3)
        target_rms = a.get("TargetRms", 1.0)
        mean = a["StatsMean"]
        var = a["StatsVar"]
        scale = target_rms / np.sqrt(var + eps)
        return {"scale": scale.astype(np.float32),
                "offset": (-mean * scale).astype(np.float32)}
    if t == "PerElementScaleComponent":
        return {"scale": a["Params"]}
    if t == "PerElementOffsetComponent":
        return {"offset": a["Offsets"]}
    return {}


def _component_forward(
    comp: ComponentSpec, params: Dict[str, jnp.ndarray], x: jnp.ndarray,
    time_offsets: List[int],
) -> jnp.ndarray:
    """Forward one component. For TdnnComponent, ``x`` must cover
    [lo + min_off, hi + max_off) and the result covers [lo, hi)."""
    t = comp.type
    a = comp.attrs
    if t in ("AffineComponent", "NaturalGradientAffineComponent",
             "FixedAffineComponent"):
        return x @ params["w"] + params["b"]
    if t == "LinearComponent":
        return x @ params["w"]
    if t == "TdnnComponent":
        offs = time_offsets
        span = offs[-1] - offs[0]
        T_out = x.shape[1] - span
        cat = jnp.concatenate(
            [x[:, (o - offs[0]) : (o - offs[0]) + T_out] for o in offs], axis=-1
        )
        y = cat @ params["w"]
        if "b" in params:
            y = y + params["b"]
        return y
    if t == "RectifiedLinearComponent":
        return jnp.maximum(x, 0.0)
    if t == "SigmoidComponent":
        return jax.nn.sigmoid(x)
    if t == "TanhComponent":
        return jnp.tanh(x)
    if t == "LogSoftmaxComponent":
        return jax.nn.log_softmax(x, axis=-1)
    if t == "SoftmaxComponent":
        return jax.nn.softmax(x, axis=-1)
    if t == "BatchNormComponent":
        dim = a["Dim"]
        block = a.get("BlockDim", dim)
        if block != dim:
            shape = x.shape
            xb = x.reshape(shape[:-1] + (dim // block, block))
            y = xb * params["scale"] + params["offset"]
            return y.reshape(shape)
        return x * params["scale"] + params["offset"]
    if t == "NormalizeComponent":
        block = a.get("BlockDim", a["InputDim"])
        target_rms = a.get("TargetRms", 1.0)
        add_log_stddev = a.get("AddLogStddev", False)
        shape = x.shape
        nblocks = shape[-1] // block
        xb = x.reshape(shape[:-1] + (nblocks, block))
        # scale so that each block has RMS target_rms
        sumsq = jnp.sum(xb * xb, axis=-1, keepdims=True)
        scale = target_rms * jnp.sqrt(block) * jax.lax.rsqrt(
            jnp.maximum(sumsq, 1.0e-20)
        )
        y = xb * scale
        if add_log_stddev:
            log_stddev = 0.5 * jnp.log(
                jnp.maximum(sumsq, 1.0e-20) / block
            ) - jnp.log(target_rms)
            y = jnp.concatenate([y, log_stddev], axis=-1)
            return y.reshape(shape[:-1] + (nblocks * (block + 1),))
        return y.reshape(shape)
    if t == "SumBlockComponent":
        in_dim, out_dim = a["InputDim"], a["OutputDim"]
        scale = a.get("Scale", 1.0)
        shape = x.shape
        xb = x.reshape(shape[:-1] + (in_dim // out_dim, out_dim))
        return scale * jnp.sum(xb, axis=-2)
    if t == "PerElementScaleComponent":
        return x * params["scale"]
    if t == "PerElementOffsetComponent":
        return x + params["offset"]
    if t in ("NoOpComponent", "DropoutComponent", "GeneralDropoutComponent",
             "SpecAugmentTimeMaskComponent", "BackpropTruncationComponent",
             "ClipGradientComponent"):
        return x
    raise NotImplementedError(f"component type {t} forward not implemented")


# ---------------------------------------------------------------------------
# Compiled model
# ---------------------------------------------------------------------------


@dataclass
class CompiledNnet3:
    """A planned nnet3 forward over fixed frame counts.

    Attributes:
      spec: the parsed model.
      num_out_frames: output frames per invocation (at the subsampled rate).
      subsampling: frame_subsampling_factor (3 for chain models).
      left_context / right_context: input frames needed beyond the output
        window (derived from the graph plan, like Kaldi's ComputeSimpleNnetContext).
      ranges: per-node planned [lo, hi) time ranges.
      params: name -> dict of jnp arrays.
    """

    spec: Nnet3Spec
    num_out_frames: int
    subsampling: int
    output_name: str
    ranges: Dict[str, Tuple[int, int]]
    order: List[NodeSpec]
    params: Dict[str, Dict[str, jnp.ndarray]]
    node_dims: Dict[str, int]
    ivector_period: int = 0  # 0 = single ivector at t=0

    @property
    def left_context(self) -> int:
        return -self.ranges["input"][0]

    @property
    def right_context(self) -> int:
        last_out_t = (self.num_out_frames - 1) * self.subsampling
        return self.ranges["input"][1] - 1 - last_out_t

    @property
    def num_input_frames(self) -> int:
        lo, hi = self.ranges["input"]
        return hi - lo

    @property
    def output_dim(self) -> int:
        return self.node_dims[self.output_name]

    def forward(
        self,
        feats: jnp.ndarray,
        ivector: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Run the planned forward.

        Args:
          feats: [B, num_input_frames, feat_dim]; feats[:, 0] is input time
            ranges['input'][0] (i.e. -left_context on the output clock).
          ivector: [B, ivec_dim] single ivector (used for every frame via
            ReplaceIndex/Round descriptors), or [B, n, ivec_dim] with
            ivector_period spacing starting at t=0.

        Returns:
          [B, num_out_frames, output_dim]
        """
        values: Dict[str, jnp.ndarray] = {}
        origins: Dict[str, int] = {}

        def eval_desc(desc: Descriptor, lo: int, hi: int) -> jnp.ndarray:
            kind = desc[0]
            if kind == "node":
                name = desc[1]
                arr = values[name]
                org = origins[name]
                return arr[:, lo - org : hi - org]
            if kind == "offset":
                return eval_desc(desc[1], lo + desc[2], hi + desc[2])
            if kind == "append":
                return jnp.concatenate(
                    [eval_desc(s, lo, hi) for s in desc[1]], axis=-1
                )
            if kind == "sum":
                parts = [eval_desc(s, lo, hi) for s in desc[1]]
                out = parts[0]
                for p in parts[1:]:
                    out = out + p
                return out
            if kind == "switch":
                # Switch(d0, d1, ...): selects by t mod n; only used in rare
                # discretized setups — implement by interleave.
                raise NotImplementedError("Switch descriptor")
            if kind == "scale":
                return desc[1] * eval_desc(desc[2], lo, hi)
            if kind == "const":
                b = feats.shape[0]
                return jnp.full((b, hi - lo, desc[2]), desc[1], dtype=feats.dtype)
            if kind == "replace_index":
                one = eval_desc(desc[1], desc[3], desc[3] + 1)
                return jnp.broadcast_to(
                    one, (one.shape[0], hi - lo, one.shape[2])
                )
            if kind == "round":
                m = desc[2]
                ts = np.arange(lo, hi)
                src = (ts // m) * m
                sub_lo = int(src.min())
                sub_hi = int(src.max()) + 1
                arr = eval_desc(desc[1], sub_lo, sub_hi)
                return arr[:, src - sub_lo]
            if kind == "ifdefined":
                # Clamped evaluation: frames outside the computable range of
                # the sub-descriptor read as zeros.
                sub = desc[1]
                sub_lo, sub_hi = _computable_range(sub)
                ov_lo, ov_hi = max(lo, sub_lo), min(hi, sub_hi)
                dim = _desc_dim(sub, self.node_dims)
                b = feats.shape[0]
                if ov_hi <= ov_lo:
                    return jnp.zeros((b, hi - lo, dim), dtype=feats.dtype)
                mid = eval_desc(sub, ov_lo, ov_hi)
                pads = ((0, 0), (ov_lo - lo, hi - ov_hi), (0, 0))
                return jnp.pad(mid, pads)
            if kind == "failover":
                sub_lo, sub_hi = _computable_range(desc[1])
                if sub_lo <= lo and hi <= sub_hi:
                    return eval_desc(desc[1], lo, hi)
                return eval_desc(desc[2], lo, hi)
            raise ValueError(kind)

        def _computable_range(desc: Descriptor) -> Tuple[int, int]:
            kind = desc[0]
            if kind == "node":
                return self.ranges[desc[1]]
            if kind == "offset":
                lo, hi = _computable_range(desc[1])
                return lo - desc[2], hi - desc[2]
            if kind in ("append", "sum"):
                los, his = zip(*(_computable_range(s) for s in desc[1]))
                return max(los), min(his)
            if kind == "scale":
                return _computable_range(desc[2])
            if kind in ("const",):
                return (-(10**9), 10**9)
            if kind == "replace_index":
                return (-(10**9), 10**9)
            if kind == "round":
                lo, hi = _computable_range(desc[1])
                m = desc[2]
                return lo, hi  # conservative
            if kind in ("ifdefined",):
                return (-(10**9), 10**9)
            if kind == "failover":
                lo2, hi2 = _computable_range(desc[2])
                return lo2, hi2
            raise ValueError(kind)

        # Inputs
        in_lo, in_hi = self.ranges["input"]
        if feats.shape[1] != in_hi - in_lo:
            raise ValueError(
                f"feats must have {in_hi - in_lo} frames "
                f"(got {feats.shape[1]}): left_context={self.left_context}, "
                f"chunk={self.num_out_frames}x{self.subsampling}, "
                f"right_context={self.right_context}"
            )
        values["input"] = feats
        origins["input"] = in_lo

        if "ivector" in self.ranges:
            if ivector is None:
                raise ValueError("model requires an ivector input")
            iv_lo, iv_hi = self.ranges["ivector"]
            if ivector.ndim == 2:
                ivector = ivector[:, None, :]
            period = self.ivector_period if self.ivector_period > 0 else max(
                iv_hi - iv_lo, 1
            )
            # Materialize ivector per needed frame by repeating each stored
            # ivector over its period window.
            n_have = ivector.shape[1]
            ts = np.arange(iv_lo, iv_hi)
            idx = np.clip(np.floor_divide(np.maximum(ts, 0), period), 0, n_have - 1)
            values["ivector"] = ivector[:, idx]
            origins["ivector"] = iv_lo

        # Evaluate nodes in topological (config) order
        for node in self.order:
            if node.kind == "input":
                continue
            lo, hi = self.ranges[node.name]
            if node.kind == "component":
                comp = self.spec.components[node.component]
                offs = _component_time_offsets(comp)
                x = eval_desc(node.input, lo + offs[0], hi + offs[-1])
                y = _component_forward(
                    comp, self.params.get(node.component, {}), x, offs
                )
            elif node.kind == "output":
                y = eval_desc(node.input, lo, hi)
            elif node.kind == "dim-range":
                src = values[node.input_node]
                src_lo = origins[node.input_node]
                y = src[:, lo - src_lo : hi - src_lo,
                        node.dim_offset : node.dim_offset + node.dim]
            else:  # pragma: no cover
                raise ValueError(node.kind)
            values[node.name] = y
            origins[node.name] = lo

        out = values[self.output_name]
        # Subsample: output frames at t = 0, sub, 2*sub, ...
        out_lo = origins[self.output_name]
        idx = np.arange(self.num_out_frames) * self.subsampling - out_lo
        return out[:, idx]


def compile_nnet3(
    spec: Nnet3Spec,
    num_out_frames: int,
    subsampling: int = 3,
    output_name: str = "output",
    ivector_period: int = 0,
) -> CompiledNnet3:
    """Plan per-node time ranges for a fixed output window.

    The plan requests output times {0, sub, ..., sub*(N-1)} and propagates
    required ranges backwards through descriptors and TdnnComponent time
    offsets (Kaldi: nnet-compile.cc ComputeComputationGraph equivalent for
    the simple-looped case)."""
    node_by_name = {n.name: n for n in spec.nodes}
    if output_name not in node_by_name:
        raise KeyError(f"no output node {output_name!r}")

    # Reject recurrent graphs loudly: a descriptor referencing a node
    # defined LATER in config order is a back-edge (LSTM-style recurrence),
    # which this feedforward planner cannot evaluate.
    seen_names = set()
    for node in spec.nodes:
        if node.kind in ("component", "output") and node.input is not None:
            refs: set = set()
            _collect_node_refs(node.input, refs)
            later = refs - seen_names - {node.name}
            if later:
                raise NotImplementedError(
                    f"node {node.name!r} references {sorted(later)} defined "
                    "later in the graph — recurrent nnet3 models (LSTMs) are "
                    "not supported by the feedforward planner yet"
                )
        seen_names.add(node.name)

    # Node dims (forward pass over config order)
    node_dims: Dict[str, int] = {}
    for node in spec.nodes:
        if node.kind == "input":
            node_dims[node.name] = node.dim
        elif node.kind == "component":
            node_dims[node.name] = spec.components[node.component].output_dim
        elif node.kind == "dim-range":
            node_dims[node.name] = node.dim
        elif node.kind == "output":
            node_dims[node.name] = _desc_dim(node.input, node_dims)

    # Backward range planning (reverse config order = reverse topological)
    ranges: Dict[str, Tuple[int, int]] = {}
    last_t = (num_out_frames - 1) * subsampling
    _accumulate(ranges, output_name, 0, last_t + 1)
    for node in reversed(spec.nodes):
        if node.name not in ranges or node.kind == "input":
            continue
        lo, hi = ranges[node.name]
        if node.kind == "component":
            comp = spec.components[node.component]
            offs = _component_time_offsets(comp)
            _desc_ranges(node.input, lo + offs[0], hi + offs[-1], ranges)
        elif node.kind == "output":
            _desc_ranges(node.input, lo, hi, ranges)
        elif node.kind == "dim-range":
            _accumulate(ranges, node.input_node, lo, hi)

    # Parameters
    params = {
        name: {
            k: jnp.asarray(v) for k, v in _extract_params(comp).items()
        }
        for name, comp in spec.components.items()
    }

    order = [n for n in spec.nodes if n.name in ranges or n.kind == "input"]
    # Drop nodes never requested (e.g. unused xent branch heads)
    order = [n for n in order if n.name in ranges or n.kind == "input"]

    return CompiledNnet3(
        spec=spec,
        num_out_frames=num_out_frames,
        subsampling=subsampling,
        output_name=output_name,
        ranges=ranges,
        order=order,
        params=params,
        node_dims=node_dims,
        ivector_period=ivector_period,
    )
