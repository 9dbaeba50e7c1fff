"""Finite-state-machine document structure parser (engine).

A from-scratch implementation of the reference's configurable FSM parser
semantics (``ferenda/fsmparser.py:13-268``): a prioritized list of
recognizer predicates, a transition table keyed by (state, recognizer),
constructors that consume chunks and recursively build nested children,
and the ``(False, newstate)`` "don't construct — unwind to the parent
constructor and retarget its state" transition
(``fsmparser.py:229-239``). Chunk streams are wrapped in a Peekable
reader (``fsmparser.py`` Peekable analog).

The element model is plain dicts — ``{"kind": ..., "children": [...]}``
plus kind-specific fields — serialized to JSON (the reference round-trips
its element tree through XML/JSON too, ``elements.py:53-93``), which keeps
Ray batches Arrow-friendly.

Used inside ``map_batches``: one FSMParser instance per worker, stateless
across documents (``parse`` resets all per-doc state).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable


class Peekable:
    """Iterator with one-chunk lookahead."""

    _SENTINEL = object()

    def __init__(self, it: Iterable):
        self._it = iter(it)
        self._peeked = self._SENTINEL

    def peek(self):
        if self._peeked is self._SENTINEL:
            self._peeked = next(self._it)  # may raise StopIteration
        return self._peeked

    def next(self):
        if self._peeked is not self._SENTINEL:
            out = self._peeked
            self._peeked = self._SENTINEL
            return out
        return next(self._it)

    @property
    def eof(self) -> bool:
        try:
            self.peek()
            return False
        except StopIteration:
            return True


class FSMParseError(Exception):
    pass


class FSMParser:
    """Recognizer-priority + transition-table document parser.

    * ``recognizers``: ordered list of predicates ``fn(parser, chunk) ->
      bool``; the FIRST match wins (ordering matters, reference
      ``fsmparser.py:134-152``).
    * ``transitions``: ``{(state, recognizer): (constructor|False,
      newstate|None|callable)}``. States may be given as a tuple of states
      (expanded). ``newstate`` may be a callable ``(parser, chunk) ->
      state`` for data-dependent states (e.g. section depth).
    * a ``constructor(parser)`` consumes ``parser.reader.next()`` (and may
      call ``parser.make_children(elem)``) and returns an element dict.
    * ``(False, newstate)`` means: the chunk belongs to an ancestor —
      unwind the current ``make_children`` loop (return to parent) after
      retargeting the current state.
    """

    def __init__(self):
        self.recognizers: list[Callable] = []
        self.transitions: dict = {}
        self.initial_state = "body"
        self.initial_constructor: Callable | None = None
        self.reader: Peekable | None = None
        self._state_stack: list = []
        self.debug = False

    # -- configuration ------------------------------------------------
    def set_recognizers(self, *fns) -> None:
        self.recognizers = list(fns)

    def set_transitions(self, table: dict) -> None:
        self.transitions = {}
        for (state, rec), action in table.items():
            states = state if isinstance(state, tuple) else (state,)
            for st in states:
                self.transitions[(st, rec)] = action

    # -- state handling -------------------------------------------------
    @property
    def current_state(self):
        return self._state_stack[-1]

    def set_state(self, state) -> None:
        self._state_stack[-1] = state

    # -- parsing ----------------------------------------------------------
    def analyze(self, chunk):
        for rec in self.recognizers:
            if rec(self, chunk):
                return rec
        raise FSMParseError(f"no recognizer matched chunk {chunk!r}")

    def parse(self, chunks: Iterable) -> dict:
        assert self.initial_constructor is not None
        self.reader = Peekable(chunks)
        self._state_stack = [self.initial_state]
        return self.initial_constructor(self)

    def make_child(self, constructor: Callable, state) -> dict:
        """Run ``constructor`` under a pushed state; pop afterwards."""
        self._state_stack.append(state)
        try:
            return constructor(self)
        finally:
            self._state_stack.pop()

    def make_children(self, parent: dict) -> dict:
        """The core loop: peek → analyze → transition → construct/unwind."""
        while not self.reader.eof:
            chunk = self.reader.peek()
            rec = self.analyze(chunk)
            key = (self.current_state, rec)
            if key not in self.transitions:
                key = ("*", rec)
                if key not in self.transitions:
                    raise FSMParseError(
                        f"no transition for state={self.current_state!r} "
                        f"recognizer={getattr(rec, '__name__', rec)!r}"
                    )
            action = self.transitions[key]
            if callable(action):
                # data-dependent transition: fn(parser, chunk) ->
                # (constructor, newstate) — the reference supports callable
                # transition values the same way (fsmparser.py:200-214)
                action = action(self, chunk)
            constructor, newstate = action
            if callable(newstate) and not isinstance(newstate, str):
                newstate = newstate(self, chunk)
            if constructor is False:
                # unwind: the chunk belongs to an ancestor level
                if newstate is not None:
                    self.set_state(newstate)
                return parent
            child_state = newstate if newstate is not None else self.current_state
            elem = self.make_child(constructor, child_state)
            if elem is not None:
                parent["children"].append(elem)
        return parent
