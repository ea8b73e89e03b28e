"""Test-support harnesses shipped with the package (not test fixtures).

`differential` is the randomized cross-engine fuzz harness; it lives in the
package (not tests/) so the long-sweep script and the CI subset share one
implementation.
"""
