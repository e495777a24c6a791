"""Users, roles and privileges — the reference's role subsystem.

Reference parity:
- model: ``server/src/main/java/io/crate/role/Role.java`` (name,
  superuser flag, password, granted roles), ``Privilege.java`` /
  ``Subject.java`` (policy GRANT/DENY/REVOKE, permission
  DQL/DML/DDL/AL, securable CLUSTER/SCHEMA/TABLE/VIEW, ident)
- resolution: ``Roles.java:177-205`` — depth-first over granted
  roles, DENY precedence; ``RolePrivileges.java:121`` — most
  specific securable first (TABLE/VIEW -> SCHEMA -> CLUSTER), an
  explicit policy at a lower level overrides higher levels
- statements: ``docs/sql/statements/create-user.rst``,
  ``create-role.rst``, ``grant.rst``, ``deny.rst``, ``revoke.rst``
- sys tables: ``role/metadata/SysUsersTableInfo.java`` (name,
  superuser, password placeholder, granted_roles),
  ``SysRolesTableInfo.java``, ``SysPrivilegesTableInfo.java``
  (grantee, grantor, state, type, class, ident)

This is session/catalog metadata — plain Python state, no Spark jobs.
Enforcement happens in ``CrateSession.execute`` before planning, the
analog of the reference's ``AccessControlImpl`` statement visitor.
"""

from __future__ import annotations

from dataclasses import dataclass, field

PERMISSIONS = ("DQL", "DML", "DDL", "AL")
SECURABLES = ("CLUSTER", "SCHEMA", "TABLE", "VIEW")

#: superuser created at bootstrap (reference Role.CRATE_USER)
SUPERUSER = "crate"


class RoleError(Exception):
    """Role management failure (unknown/duplicate role, bad grant)."""


class PermissionDenied(Exception):
    """Statement rejected by privilege check (UnauthorizedException)."""


@dataclass
class Role:
    name: str
    is_user: bool = True
    superuser: bool = False
    password: str | None = None
    #: [(role_name, grantor)]
    granted_roles: list[tuple[str, str]] = field(default_factory=list)
    #: ALTER USER ... SET (<setting> = ...) session defaults
    #: (alter-role.rst; surfaced in sys.users.session_settings)
    session_settings: dict[str, str] = field(default_factory=dict)

    def granted_role_names(self) -> list[str]:
        return [r for r, _ in self.granted_roles]


@dataclass(frozen=True)
class Privilege:
    grantee: str
    grantor: str
    state: str  # GRANT | DENY
    type: str  # DQL | DML | DDL | AL
    clazz: str  # CLUSTER | SCHEMA | TABLE | VIEW
    ident: str | None  # None for CLUSTER, 'doc' / 'doc.t' otherwise

    def subject(self) -> tuple:
        return (self.type, self.clazz, self.ident)


class RoleStore:
    """In-memory role catalog with reference resolution semantics."""

    def __init__(self) -> None:
        self.roles: dict[str, Role] = {
            SUPERUSER: Role(SUPERUSER, is_user=True, superuser=True)
        }
        #: grantee -> {subject -> Privilege}; REVOKE deletes the entry
        self.privileges: dict[str, dict[tuple, Privilege]] = {}

    # -- role DDL --------------------------------------------------------
    def create(self, name: str, *, is_user: bool, password: str | None = None) -> None:
        key = name.lower()
        if key in self.roles:
            raise RoleError(f"Role '{name}' already exists")
        if not is_user and password is not None:
            # create-role.rst: roles cannot log in, no password
            raise RoleError("Cannot set a password for a role")
        self.roles[key] = Role(key, is_user=is_user, password=password)

    def drop(self, name: str, *, if_exists: bool = False) -> bool:
        key = name.lower()
        if key == SUPERUSER:
            raise RoleError("Cannot drop the superuser 'crate'")
        if key not in self.roles:
            if if_exists:
                return False
            raise RoleError(f"Role '{name}' does not exist")
        # drop-user.rst: fails while the role is granted to others
        for other in self.roles.values():
            if key in other.granted_role_names():
                raise RoleError(
                    f"Cannot drop role '{name}': it is granted to '{other.name}'"
                )
        del self.roles[key]
        self.privileges.pop(key, None)
        return True

    def alter_password(self, name: str, password: str | None) -> None:
        role = self._get(name)
        if not role.is_user and password is not None:
            raise RoleError("Cannot set a password for a role")
        role.password = password

    def alter_session_setting(
        self, name: str, setting: str | None, value: str | None
    ) -> None:
        """ALTER USER ... SET (<setting> = <value>) / RESET <setting> /
        RESET ALL (alter-role.rst:40-78; users only, not roles)."""
        role = self._get(name)
        if not role.is_user:
            raise RoleError(
                f"Cannot alter session settings for role '{name}' "
                "(ALTER is supported for users only)"
            )
        if setting is None:  # RESET ALL
            role.session_settings.clear()
        elif value is None:  # RESET <setting>
            role.session_settings.pop(setting.lower(), None)
        else:
            role.session_settings[setting.lower()] = value

    def _get(self, name: str) -> Role:
        key = name.lower()
        if key not in self.roles:
            raise RoleError(f"Role '{name}' does not exist")
        return self.roles[key]

    # -- GRANT / DENY / REVOKE ------------------------------------------
    def apply_privileges(
        self,
        state: str,
        permissions: list[str],
        clazz: str,
        idents: list[str | None],
        grantees: list[str],
        grantor: str,
    ) -> int:
        """GRANT/DENY/REVOKE permissions; returns affected-row count
        (reference returns one row per (privilege, ident, grantee))."""
        state = state.upper()
        clazz = clazz.upper()
        if clazz not in SECURABLES:
            raise RoleError(f"Unknown securable: {clazz}")
        count = 0
        for grantee in grantees:
            role = self._get(grantee)
            if role.superuser:
                raise RoleError(
                    f"Cannot alter privileges for superuser '{role.name}'"
                )
            bucket = self.privileges.setdefault(role.name, {})
            for perm in permissions:
                perm = perm.upper()
                if perm not in PERMISSIONS:
                    raise RoleError(f"Unknown privilege type: {perm}")
                for ident in idents:
                    subject = (perm, clazz, ident)
                    if state == "REVOKE":
                        if bucket.pop(subject, None) is not None:
                            count += 1
                    else:
                        # affected-row count = privileges actually
                        # CHANGED (privileges.rst: re-granting an
                        # existing GRANT reports 0 rows for it)
                        prev = bucket.get(subject)
                        if prev is None or prev.state != state:
                            bucket[subject] = Privilege(
                                role.name, grantor, state, perm, clazz, ident
                            )
                            count += 1
        return count

    def grant_roles(self, rolenames: list[str], grantees: list[str], grantor: str) -> int:
        count = 0
        for rolename in rolenames:
            granted = self._get(rolename)
            if granted.is_user:
                # grant.rst: only roles can be granted to users/roles
                raise RoleError(f"Cannot grant a user ('{rolename}')")
            for grantee in grantees:
                target = self._get(grantee)
                if granted.name == target.name:
                    raise RoleError(f"Cannot grant role '{rolename}' to itself")
                if target.name in self._all_parents(granted.name):
                    raise RoleError(
                        f"Circular grant: '{rolename}' already inherits from '{grantee}'"
                    )
                if granted.name not in target.granted_role_names():
                    target.granted_roles.append((granted.name, grantor))
                    count += 1
        return count

    def revoke_roles(self, rolenames: list[str], grantees: list[str]) -> int:
        count = 0
        for rolename in rolenames:
            key = rolename.lower()
            for grantee in grantees:
                target = self._get(grantee)
                before = len(target.granted_roles)
                target.granted_roles = [
                    (r, g) for r, g in target.granted_roles if r != key
                ]
                count += before - len(target.granted_roles)
        return count

    def _all_parents(self, name: str) -> set[str]:
        """Transitive granted-role closure (Roles.findAllParents)."""
        out: set[str] = set()
        stack = [name.lower()]
        while stack:
            cur = stack.pop()
            role = self.roles.get(cur)
            if role is None:
                continue
            for parent in role.granted_role_names():
                if parent not in out:
                    out.add(parent)
                    stack.append(parent)
        return out

    # -- resolution ------------------------------------------------------
    def _match(self, role: Role, perm: str, clazz: str, ident: str | None) -> str:
        """RolePrivileges.matchPrivilege: most specific securable
        first; an explicit GRANT/DENY at a level is final."""
        bucket = self.privileges.get(role.name, {})
        chain: list[tuple[str, str | None]] = []
        if clazz in ("TABLE", "VIEW"):
            chain.append((clazz, ident))
            schema = ident.split(".")[0] if ident and "." in ident else "doc"
            chain.append(("SCHEMA", schema))
            chain.append(("CLUSTER", None))
        elif clazz == "SCHEMA":
            chain.append(("SCHEMA", ident))
            chain.append(("CLUSTER", None))
        else:
            chain.append(("CLUSTER", None))
        for level, level_ident in chain:
            p = bucket.get((perm, level, level_ident))
            if p is not None:
                return p.state
        return "REVOKE"

    def _resolve(self, role: Role, perm: str, clazz: str, ident: str | None) -> str:
        """Roles.hasPrivilege recursion: own privileges first, then
        depth-first over granted roles with DENY precedence."""
        if role.superuser:
            return "GRANT"
        resolution = self._match(role, perm, clazz, ident)
        if resolution in ("GRANT", "DENY"):
            return resolution
        result = "REVOKE"
        for parent_name in role.granted_role_names():
            parent = self.roles.get(parent_name)
            if parent is None:
                continue
            partial = self._resolve(parent, perm, clazz, ident)
            if partial == "DENY":
                return "DENY"
            if result == "REVOKE":
                result = partial
        return result

    def has_privilege(
        self, user: str, perm: str, clazz: str = "CLUSTER", ident: str | None = None
    ) -> bool:
        role = self._get(user)
        return self._resolve(role, perm.upper(), clazz.upper(), ident) == "GRANT"

    def check(
        self, user: str, perm: str, clazz: str = "CLUSTER", ident: str | None = None
    ) -> None:
        if not self.has_privilege(user, perm, clazz, ident):
            where = f" on {clazz.lower()} {ident}" if ident else ""
            raise PermissionDenied(
                f"User \"{user}\" is not authorized to execute a {perm} statement{where}"
            )

    # -- sys rows --------------------------------------------------------
    @staticmethod
    def _granted_json(r: Role) -> str:
        # grantor-first key order matches the reference's render
        # (user-management.rst sys.roles/sys.users examples)
        import json

        return json.dumps(
            [{"grantor": g, "role": rn} for rn, g in sorted(r.granted_roles)]
        )

    def sys_users_rows(self) -> list[tuple]:
        """(name, superuser, password, granted_roles_json,
        session_settings_json) rows — SysUsersTableInfo shape;
        password always masked."""
        import json

        return [
            (
                r.name,
                r.superuser,
                "********" if r.password else None,
                self._granted_json(r),
                json.dumps(dict(sorted(r.session_settings.items()))),
            )
            for r in sorted(self.roles.values(), key=lambda x: x.name)
            if r.is_user
        ]

    def sys_roles_rows(self) -> list[tuple]:
        return [
            (r.name, self._granted_json(r))
            for r in sorted(self.roles.values(), key=lambda x: x.name)
            if not r.is_user
        ]

    def sys_privileges_rows(self) -> list[tuple]:
        """Alphabetical column order (class, grantee, grantor, ident,
        state, type) — the reference's SELECT * render
        (privileges.rst listing example)."""
        rows = []
        for grantee in sorted(self.privileges):
            for p in self.privileges[grantee].values():
                rows.append((p.clazz, p.grantee, p.grantor, p.ident, p.state, p.type))
        rows.sort(key=lambda r: tuple("" if v is None else v for v in r))
        return rows
