// Minimal in-process JDBC driver for smoke-testing Spark's JDBC source
// (reference S1: src/database/data_loader.py:8-29 loads a registry over
// JDBC; this sandbox has no database or vendor driver jar, so the read
// path could otherwise never execute).
//
// Serves a fixed 3-column table (id BIGINT, name VARCHAR, val DOUBLE)
// with `rows=N` taken from the URL (jdbc:stub:mem?rows=N). A query
// containing WHERE 1=0 / WHERE 0=1 (Spark's schema probe) returns an
// empty result set with full metadata. Everything except the Driver
// itself is a java.lang.reflect.Proxy so the whole JDBC surface fits in
// one file: methods Spark actually calls are answered; the rest return
// type-appropriate defaults.
package stubjdbc;

import java.lang.reflect.InvocationHandler;
import java.lang.reflect.Method;
import java.lang.reflect.Proxy;
import java.sql.Connection;
import java.sql.DatabaseMetaData;
import java.sql.Driver;
import java.sql.DriverManager;
import java.sql.DriverPropertyInfo;
import java.sql.PreparedStatement;
import java.sql.ResultSet;
import java.sql.ResultSetMetaData;
import java.sql.SQLException;
import java.sql.Statement;
import java.sql.Types;
import java.util.Properties;
import java.util.logging.Logger;

public class StubDriver implements Driver {
    static {
        try {
            DriverManager.registerDriver(new StubDriver());
        } catch (SQLException e) {
            throw new RuntimeException(e);
        }
    }

    public boolean acceptsURL(String url) {
        return url != null && url.startsWith("jdbc:stub:");
    }

    public Connection connect(String url, Properties info) throws SQLException {
        if (!acceptsURL(url)) {
            return null;
        }
        int rows = 5;
        int idx = url.indexOf("rows=");
        if (idx >= 0) {
            String tail = url.substring(idx + 5);
            int end = 0;
            while (end < tail.length() && Character.isDigit(tail.charAt(end))) {
                end++;
            }
            rows = Integer.parseInt(tail.substring(0, end));
        }
        return (Connection) StubHandler.proxy(Connection.class, new StubHandler("connection", rows));
    }

    public int getMajorVersion() { return 1; }
    public int getMinorVersion() { return 0; }
    public DriverPropertyInfo[] getPropertyInfo(String u, Properties p) { return new DriverPropertyInfo[0]; }
    public boolean jdbcCompliant() { return false; }
    public Logger getParentLogger() { return Logger.getLogger("stubjdbc"); }
}

class StubHandler implements InvocationHandler {
    final String role;
    final int rows;
    String sql;
    int pos = -1;

    StubHandler(String role, int rows) {
        this.role = role;
        this.rows = rows;
    }

    static Object proxy(Class<?> iface, StubHandler h) {
        return Proxy.newProxyInstance(iface.getClassLoader(), new Class<?>[] {iface}, h);
    }

    private static boolean probeIsEmpty(String q) {
        if (q == null) {
            return false;
        }
        String s = q.replace(" ", "").toUpperCase();
        return s.contains("WHERE1=0") || s.contains("WHERE0=1");
    }

    public Object invoke(Object p, Method m, Object[] a) {
        String n = m.getName();
        switch (n) {
            case "toString": return "stub-" + role;
            case "hashCode": return System.identityHashCode(p);
            case "equals": return p == a[0];
            case "isClosed": return false;
            case "isValid": return true;
            case "close": case "commit": case "rollback": return null;
        }
        if (role.equals("connection")) {
            if (n.equals("prepareStatement") || n.equals("createStatement")) {
                StubHandler h = new StubHandler("statement", rows);
                if (a != null && a.length > 0 && a[0] instanceof String) {
                    h.sql = (String) a[0];
                }
                return proxy(n.equals("prepareStatement") ? PreparedStatement.class : Statement.class, h);
            }
            if (n.equals("getMetaData")) {
                return proxy(DatabaseMetaData.class, new StubHandler("dbmeta", rows));
            }
            if (n.equals("getAutoCommit")) {
                return true;
            }
        } else if (role.equals("dbmeta")) {
            switch (n) {
                case "getURL": return "jdbc:stub:mem";
                case "getDatabaseProductName": return "StubDB";
                case "getDriverName": return "StubDriver";
                case "getDriverVersion": return "1.0";
                case "getDatabaseMajorVersion": return 1;
                case "getJDBCMajorVersion": return 4;
                case "getJDBCMinorVersion": return 2;
            }
        } else if (role.equals("statement")) {
            if (n.equals("executeQuery")) {
                String q = sql;
                if (a != null && a.length > 0 && a[0] instanceof String) {
                    q = (String) a[0];
                }
                return proxy(ResultSet.class, new StubHandler("resultset", probeIsEmpty(q) ? 0 : rows));
            }
            if (n.equals("getMetaData")) {
                return proxy(ResultSetMetaData.class, new StubHandler("rsmeta", rows));
            }
        } else if (role.equals("resultset")) {
            switch (n) {
                case "next": pos++; return pos < rows;
                case "getMetaData": return proxy(ResultSetMetaData.class, new StubHandler("rsmeta", rows));
                case "wasNull": return false;
                case "getLong": return (long) pos;
                case "getInt": return pos;
                case "getString": return "name-" + pos;
                case "getDouble": return pos * 1.5;
                case "getObject": return (long) pos;
            }
        } else if (role.equals("rsmeta")) {
            int col = (a != null && a.length > 0 && a[0] instanceof Integer) ? (Integer) a[0] : 0;
            switch (n) {
                case "getColumnCount": return 3;
                case "getColumnType": return col == 1 ? Types.BIGINT : col == 2 ? Types.VARCHAR : Types.DOUBLE;
                case "getColumnTypeName": return col == 1 ? "BIGINT" : col == 2 ? "VARCHAR" : "DOUBLE";
                case "getColumnName":
                case "getColumnLabel": return col == 1 ? "id" : col == 2 ? "name" : "val";
                case "getPrecision": return col == 2 ? 255 : 0;
                case "getScale": return 0;
                case "isSigned": return true;
                case "isNullable": return ResultSetMetaData.columnNullable;
            }
        }
        Class<?> rt = m.getReturnType();
        if (rt == boolean.class) return false;
        if (rt == int.class) return 0;
        if (rt == long.class) return 0L;
        if (rt == short.class) return (short) 0;
        if (rt == byte.class) return (byte) 0;
        if (rt == float.class) return 0f;
        if (rt == double.class) return 0d;
        return null;
    }
}
