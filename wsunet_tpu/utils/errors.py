"""User-facing error type.

The CLI converts these (plus FileNotFoundError) into one-line SystemExit
messages; anything else — including JAX/XLA RuntimeErrors from device or
compile failures — propagates with a full traceback so genuine bugs are
not masked.  Subclasses RuntimeError for backward compatibility with
callers that catch the registry's historical exception type.
"""


class UserError(RuntimeError):
    """A problem with the user's request (missing model, bad selection),
    not a bug in the framework."""
