"""Round-6 operator additions.

New module per the rotation discipline (CLAUDE.md): registrations
added mid-round must NEVER land in a module at or before the grading
window, so every round's new operators live in a fresh module imported
after the window block in ``plans/__init__.py``.
"""

from __future__ import annotations
