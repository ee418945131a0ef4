"""Network layer: tile codec + client/server frame protocol (the rebuild
of the reference's comm/compression stack, SURVEY.md §2.5)."""
