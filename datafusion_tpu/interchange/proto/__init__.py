"""Generated protobuf bindings for the DataFusion plan wire format.

protoc emits absolute imports (`import datafusion_common_pb2`), so this
package puts its own directory on sys.path before loading them."""
import os
import sys

_here = os.path.dirname(__file__)
if _here not in sys.path:
    sys.path.insert(0, _here)

import datafusion_common_pb2 as common_pb2  # noqa: E402,F401
import datafusion_pb2 as plan_pb2  # noqa: E402,F401
