"""Plan interchange: Substrait producer/consumer (the cross-engine IR).

Reference analogs: datafusion/substrait/src/logical_plan/{producer,consumer}
and the plan protobuf (datafusion/proto). Substrait is the standard,
engine-neutral plan representation, so plans produced by other engines
(including the reference via its substrait producer) can execute here, and
our plans can be shipped out.
"""
from .substrait import plan_from_substrait, plan_to_substrait  # noqa: F401
